"""Grain-backed host input pipeline (production data path).

Google Grain is the JAX-ecosystem replacement for the reference's tf.data
host pipeline (SURVEY.md §7.5: "tfds/grain host loader emitting batched
uint8").  This wraps any random-access source — in-memory arrays, ArrayRecord
files, or a TFDS data_source — in a deterministic, checkpointable,
multi-worker loader:

  * global shuffle per epoch with a fixed seed (exact permutation, like the
    C++ pipeline in data/native/pipeline.cc);
  * per-process sharding for multi-host (grain.sharding.ShardOptions) with
    the framework-wide batch contract: ``batch_size`` is GLOBAL, each
    process yields its batch_size/shard_count rows (reference
    input_context.get_per_replica_batch_size, tf2/data.py:43-47);
  * worker processes for parallel decode off the GIL;
  * EXACT resume (``set_start_step``) — the restored iterator continues the
    precise sampler sequence, not just the epoch phase, by reconstructing
    grain's iterator checkpoint for the target step (a capability the
    reference never had: tf.data iterators were not saved);
  * global ``index`` tags on every eval row, so the trainer's padding masks
    are exact under grain's strided sharding (TF1 pad_to_batch parity,
    data.py:31-100) — including fully-masked filler batches when ragged
    shards leave some process one batch short of the others.

Yields {'image': uint8 (B, H, W, C), 'label': int32 (B,)} (+ 'index' int32
on eval) like every other loader in data/loader.py.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import numpy as np


class ArraySource:
    """Random-access source over in-memory arrays (grain protocol).

    ``tag_index=True`` emits each record's GLOBAL position — grain's sampler
    passes the unsharded record key to the source, so the tag is exact under
    any ShardOptions."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 tag_index: bool = False, index_offset: int = 0):
        assert len(images) == len(labels)
        self.images = images
        self.labels = labels
        self.tag_index = tag_index
        self.index_offset = index_offset

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, idx: int) -> dict:
        rec = {"image": self.images[idx], "label": np.int32(self.labels[idx])}
        if self.tag_index:
            rec["index"] = np.int32(self.index_offset + idx)
        return rec


def build_grain_loader(
    source,
    batch_size: int,
    is_training: bool,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    worker_count: int = 0,
    shard_index: int = 0,
    shard_count: int = 1,
):
    """Construct a grain.DataLoader over any random-access source.

    Training: shuffled, infinite (num_epochs=None); eval: one ordered epoch.
    ``batch_size`` here is the PER-SHARD batch.
    """
    import grain

    sampler = grain.samplers.IndexSampler(
        num_records=len(source),
        shuffle=is_training,
        seed=seed,
        num_epochs=(None if is_training else 1) if num_epochs is None else num_epochs,
        shard_options=grain.sharding.ShardOptions(
            shard_index=shard_index, shard_count=shard_count, drop_remainder=is_training
        ),
    )
    operations = [
        grain.transforms.Batch(batch_size=batch_size, drop_remainder=is_training)
    ]
    return grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=operations,
        worker_count=worker_count,
    )


class GrainArrayPipeline:
    """Loader-compatible wrapper over a grain DataLoader.

    Contract parity with ArrayDataset / TFDSStream (the first-tier loaders):
    global batch split across shards, exact resume via ``set_start_step``,
    eval index tags + padded/filler batch masking.
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray, batch_size: int,
                 is_training: bool, seed: int = 0, worker_count: int = 0,
                 shard_index: int = 0, shard_count: int = 1):
        if batch_size % shard_count:
            raise ValueError(
                f"global batch size {batch_size} not divisible by "
                f"{shard_count} processes (grain loader)")
        self.batch_size = batch_size          # global
        self.local_batch = batch_size // shard_count
        self.is_training = is_training
        self.num_examples = len(images)
        self.shard_index = shard_index
        self.shard_count = shard_count
        self._worker_count = worker_count
        self._start_step = 0
        self._item_shape = images.shape[1:]
        if is_training:
            # Training: grain's own sampler sharding (drop_remainder=True is
            # exact — every shard gets floor(n/S) records per epoch).
            if self.num_examples < shard_count:
                raise ValueError(
                    f"grain training needs >= 1 record per shard: "
                    f"{self.num_examples} examples over {shard_count} "
                    f"processes")
            self._loader = build_grain_loader(
                ArraySource(images, labels), self.local_batch, True, seed,
                worker_count=worker_count, shard_index=shard_index,
                shard_count=shard_count,
            )
        else:
            # Eval: shard CONTIGUOUSLY ourselves.  Grain's
            # ShardOptions(drop_remainder=False) inside a DataLoader LOSES
            # the remainder records (measured on grain 0.2.15: 37 records
            # over 2 shards yields 18+18 — one example silently skipped),
            # which would break the every-example-exactly-once eval
            # contract.  A ceil-split slice + index_offset tags keeps the
            # masks exact instead.
            n = self.num_examples
            per = -(-n // shard_count)
            lo, hi = min(shard_index * per, n), min((shard_index + 1) * per, n)
            self._expected_batches = -(-per // self.local_batch)
            if lo == hi:
                # Empty shard (ceil-split left this process no records, e.g.
                # 9 examples over 8 processes leaves shards 5..7 empty).
                # Grain's IndexSampler REJECTS 0-record sources at
                # construction, so don't build one — __iter__ emits only the
                # fully-masked filler batches the collective protocol needs.
                self._loader = None
            else:
                self._loader = build_grain_loader(
                    ArraySource(images[lo:hi], labels[lo:hi], tag_index=True,
                                index_offset=lo),
                    self.local_batch, False, seed,
                    worker_count=worker_count, shard_index=0, shard_count=1,
                )

    def set_start_step(self, step: int):
        """EXACT resume: continue the sampler sequence from global step
        ``step``.  Grain's iterator checkpoint (get_state/set_state) records
        the last consumed sampler index per worker; for the in-process
        iterator (worker_count=0) that state is a pure function of the step —
        shard i has consumed ``step * local_batch`` records at stride
        shard_count — so the resume state is reconstructed directly.  With
        worker processes the state interleaves round-robin worker cursors;
        there the iterator is advanced instead (exact, linear in step)."""
        if not self.is_training:
            return
        self._start_step = int(step)

    def _training_iterator(self):
        it = iter(self._loader)
        if self._start_step <= 0:
            return it
        consumed = self._start_step * self.local_batch  # records, this shard
        if self._worker_count == 0:
            state = json.loads(it.get_state())
            state["last_seen_indices"]["0"] = (
                self.shard_index + self.shard_count * (consumed - 1))
            it.set_state(json.dumps(state).encode())
        else:
            for _ in range(self._start_step):
                next(it)
        return it

    def __iter__(self) -> Iterator[dict]:
        if self.is_training:
            for batch in self._training_iterator():
                yield {"image": batch["image"],
                       "label": np.asarray(batch["label"], np.int32)}
            return
        # Eval: pad the final partial batch (pad rows tagged index ==
        # num_examples so the trainer's mask drops them exactly), then emit
        # fully-masked filler batches up to the LARGEST shard's batch count —
        # every process must join the same number of collective eval steps
        # (same ragged-shard protocol as TFDSStream, loader.py:434-450).
        bs = self.local_batch
        n_yielded = 0
        last = None
        for batch in (self._loader if self._loader is not None else ()):
            image = np.asarray(batch["image"])
            label = np.asarray(batch["label"], np.int32)
            index = np.asarray(batch["index"], np.int32)
            if len(label) < bs:
                pad = bs - len(label)
                image = np.concatenate([image, np.repeat(image[:1], pad, 0)])
                label = np.concatenate([label, np.repeat(label[:1], pad, 0)])
                index = np.concatenate(
                    [index, np.full(pad, self.num_examples, np.int32)])
            out = {"image": image, "label": label, "index": index}
            yield out
            last = out
            n_yielded += 1
        if self.shard_count <= 1:
            return
        if last is None:  # empty shard (n < shard_count * local batch)
            last = {"image": np.zeros((bs,) + self._item_shape, np.uint8),
                    "label": np.zeros(bs, np.int32),
                    "index": np.full(bs, self.num_examples, np.int32)}
        while n_yielded < self._expected_batches:
            filler = dict(last)
            filler["index"] = np.full_like(last["index"], self.num_examples)
            yield filler
            n_yielded += 1
