"""ctypes wrapper for the native C++ batch pipeline (data/native/pipeline.cc).

Builds the shared library on first use with g++ (cached beside the source).
Falls back cleanly if no compiler is available — callers should catch
``NativePipelineUnavailable``.
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
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                     _SRC, "-o", _LIB],
                    check=True, capture_output=True,
                )
            except (OSError, subprocess.CalledProcessError) as e:
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
            ctypes.c_int, ctypes.c_int,
        ]
        lib.sp_next.restype = ctypes.c_int64
        lib.sp_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.sp_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeArrayPipeline:
    """Threaded shuffle/gather/batch over in-memory uint8 arrays, off-GIL.

    Drop-in for data.loader.ArrayDataset's iteration contract:
    yields {'image': uint8 (B, ...), 'label': int32 (B,)}.
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray, batch_size: int,
                 is_training: bool, seed: int = 0, num_threads: int = 2,
                 queue_depth: int = 4):
        assert images.dtype == np.uint8
        self._lib = _load_library()
        self.images = np.ascontiguousarray(images)
        self.labels = np.ascontiguousarray(labels.astype(np.int32))
        self.batch_size = batch_size
        self.item_shape = images.shape[1:]
        self.item_bytes = int(np.prod(self.item_shape))
        self.num_examples = len(images)
        self._handle = self._lib.sp_create(
            self.images.ctypes.data, self.num_examples, self.item_bytes,
            self.labels.ctypes.data, batch_size, seed, num_threads, queue_depth,
            1 if is_training else 0,  # drop_remainder
            1 if is_training else 0,  # loop
        )
        if not self._handle:
            raise NativePipelineUnavailable("sp_create failed")

    def __iter__(self) -> Iterator[dict]:
        out_img = np.empty((self.batch_size,) + self.item_shape, np.uint8)
        out_lab = np.empty((self.batch_size,), np.int32)
        while True:
            idx = self._lib.sp_next(self._handle, out_img.ctypes.data, out_lab.ctypes.data)
            if idx < 0:
                return
            yield {"image": out_img.copy(), "label": out_lab.copy()}

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.sp_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
