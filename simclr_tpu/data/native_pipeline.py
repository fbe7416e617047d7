"""ctypes wrapper for the native C++ batch pipeline (data/native/pipeline.cc).

Builds the shared library on first use with g++ (cached beside the source).
Falls back cleanly if no compiler is available — callers should catch
``NativePipelineUnavailable``.

Contract parity with the first-tier loaders (ArrayDataset / TFDSStream):

  * ``set_start_step`` — EXACT training resume: every native batch is a pure
    function of its global index (per-epoch Fisher-Yates permutation +
    offset), so the C++ cursors simply start at the restored step.
  * eval rows carry global ``index`` tags (the C++ eval pass is sequential,
    so row k of batch b is example ``index_offset + b*batch + k``); pad and
    filler rows are tagged ``num_examples`` so the trainer's padding masks
    are exact (TF1 pad_to_batch parity, data.py:31-100).
  * multi-process: the dispatcher (data/loader.py::make_array_pipeline)
    hands each process its contiguous slice plus ``index_offset`` /
    ``expected_batches``, so ragged shards emit fully-masked filler batches
    and every process joins the same number of collective eval steps.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "pipeline.cc")
_LIB = os.path.join(os.path.dirname(__file__), "native", "libsimclr_pipeline.so")
_build_lock = threading.Lock()
_lib = None


class NativePipelineUnavailable(RuntimeError):
    pass


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        def build():
            # Compile to a per-process temp path, then atomically rename:
            # concurrent processes (multi-host tests spawn several) must
            # never observe a half-written .so.
            tmp = f"{_LIB}.{os.getpid()}.tmp"
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                     _SRC, "-o", tmp],
                    check=True, capture_output=True,
                )
                os.replace(tmp, _LIB)
            except (OSError, subprocess.CalledProcessError) as e:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise NativePipelineUnavailable(f"cannot build native pipeline: {e}")

        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            build()
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            # A stale .so from another host/toolchain: rebuild once, then
            # give up gracefully (the documented fallback contract).
            build()
            try:
                lib = ctypes.CDLL(_LIB)
            except OSError as e:
                raise NativePipelineUnavailable(f"cannot load native pipeline: {e}")
        lib.sp_create.restype = ctypes.c_void_p
        lib.sp_create.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int64,
        ]
        lib.sp_next.restype = ctypes.c_int64
        lib.sp_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.sp_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeArrayPipeline:
    """Threaded shuffle/gather/batch over in-memory uint8 arrays, off-GIL.

    Drop-in for data.loader.ArrayDataset's iteration contract:
    yields {'image': uint8 (B, ...), 'label': int32 (B,)} — plus
    'index' int32 (B,) on eval passes.

    The C++ workers start lazily at first iteration (not construction), so
    ``set_start_step`` can position the resume cursor first, and an unused
    pipeline holds no threads.
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray, batch_size: int,
                 is_training: bool, seed: int = 0, num_threads: int = 2,
                 queue_depth: int = 4, index_offset: int = 0,
                 num_examples_global: Optional[int] = None,
                 expected_batches: Optional[int] = None):
        assert images.dtype == np.uint8
        self._lib = _load_library()  # fail at construction, not first batch
        self.images = np.ascontiguousarray(images)
        self.labels = np.ascontiguousarray(labels.astype(np.int32))
        self.batch_size = batch_size
        self.is_training = is_training
        self.item_shape = images.shape[1:]
        self.item_bytes = int(np.prod(self.item_shape))
        self.num_examples = len(images)  # local shard size
        self.index_offset = index_offset
        self.num_examples_global = (num_examples_global
                                    if num_examples_global is not None
                                    else len(images))
        self.expected_batches = expected_batches
        self._seed = seed
        self._num_threads = num_threads
        self._queue_depth = queue_depth
        self._start_step = 0
        self._handle = None

    def set_start_step(self, step: int):
        """Exact training resume: the first produced batch is global batch
        ``step`` of the uninterrupted sequence (each batch is a stateless
        function of its index in the C++ pipeline)."""
        if not self.is_training:
            return
        if self._handle is not None:
            raise RuntimeError("set_start_step must precede iteration")
        self._start_step = int(step)

    def _ensure_created(self):
        if self._handle is not None:
            return
        self._handle = self._lib.sp_create(
            self.images.ctypes.data, self.num_examples, self.item_bytes,
            self.labels.ctypes.data, self.batch_size, self._seed,
            self._num_threads, self._queue_depth,
            1 if self.is_training else 0,  # drop_remainder
            1 if self.is_training else 0,  # loop
            self._start_step,
        )
        if not self._handle:
            raise NativePipelineUnavailable("sp_create failed")

    def __iter__(self) -> Iterator[dict]:
        self._ensure_created()
        bs = self.batch_size
        out_img = np.empty((bs,) + self.item_shape, np.uint8)
        out_lab = np.empty((bs,), np.int32)
        n_yielded = 0
        last = None
        while True:
            idx = self._lib.sp_next(self._handle, out_img.ctypes.data,
                                    out_lab.ctypes.data)
            if idx < 0:
                break
            batch = {"image": out_img.copy(), "label": out_lab.copy()}
            if not self.is_training:
                # Sequential eval pass: row k of batch idx is local example
                # idx*bs+k; pad rows (>= local size) are tagged with the
                # GLOBAL example count so the trainer's mask drops them.
                rows = idx * bs + np.arange(bs)
                gidx = np.where(rows < self.num_examples,
                                self.index_offset + rows,
                                self.num_examples_global).astype(np.int32)
                batch["index"] = gidx
            yield batch
            last = batch
            n_yielded += 1
        if self.is_training or self.expected_batches is None:
            return
        if last is None:  # empty shard (n < shard_count * local batch)
            last = {"image": np.zeros((bs,) + self.item_shape, np.uint8),
                    "label": np.zeros(bs, np.int32),
                    "index": np.full(bs, self.num_examples_global, np.int32)}
        # Ragged multi-process eval: emit fully-masked filler batches so
        # every process joins the same number of collective eval steps
        # (same protocol as TFDSStream, loader.py:434-450).
        while n_yielded < self.expected_batches:
            filler = dict(last)
            filler["index"] = np.full_like(last["index"],
                                           self.num_examples_global)
            yield filler
            n_yielded += 1

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.sp_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
