"""Grain-backed host input pipeline (production data path).

Google Grain is the JAX-ecosystem replacement for the reference's tf.data
host pipeline (SURVEY.md §7.5: "tfds/grain host loader emitting batched
uint8").  This wraps any random-access source — in-memory arrays, ArrayRecord
files, or a TFDS data_source — in a deterministic, checkpointable,
multi-worker loader:

  * global shuffle per epoch with a fixed seed (exact permutation, like the
    C++ pipeline in data/native/pipeline.cc);
  * per-process sharding for multi-host (grain.sharding.ShardOptions);
  * worker processes for parallel decode off the GIL;
  * iterator state save/restore for input-pipeline checkpointing — a
    capability the reference never had (tf.data iterators were not saved).

Yields {'image': uint8 (B, H, W, C), 'label': int32 (B,)} like every other
loader in data/loader.py.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np


class ArraySource:
    """Random-access source over in-memory arrays (grain protocol)."""

    def __init__(self, images: np.ndarray, labels: np.ndarray):
        assert len(images) == len(labels)
        self.images = images
        self.labels = labels

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, idx: int) -> dict:
        return {"image": self.images[idx], "label": np.int32(self.labels[idx])}


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
    """Loader-compatible wrapper: iterates a grain DataLoader and pads the
    final eval batch (mask semantics handled by the trainer)."""

    def __init__(self, images: np.ndarray, labels: np.ndarray, batch_size: int,
                 is_training: bool, seed: int = 0, worker_count: int = 0,
                 shard_index: int = 0, shard_count: int = 1):
        self.batch_size = batch_size
        self.is_training = is_training
        self.num_examples = len(images)
        self._loader = build_grain_loader(
            ArraySource(images, labels), batch_size, is_training, seed,
            worker_count=worker_count, shard_index=shard_index, shard_count=shard_count,
        )

    def __iter__(self) -> Iterator[dict]:
        for batch in self._loader:
            image, label = batch["image"], batch["label"]
            if len(label) < self.batch_size:  # pad final eval batch
                pad = self.batch_size - len(label)
                image = np.concatenate([image, np.repeat(image[:1], pad, 0)])
                label = np.concatenate([label, np.repeat(label[:1], pad, 0)])
            yield {"image": image, "label": np.asarray(label, np.int32)}
