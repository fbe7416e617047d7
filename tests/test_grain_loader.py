"""Grain production-loader tests."""

import numpy as np
import pytest

pytest.importorskip("grain")

from simclr_tpu.data.grain_loader import GrainArrayPipeline


@pytest.fixture(scope="module")
def arrays():
    rng = np.random.RandomState(0)
    return (rng.randint(0, 256, size=(37, 4, 4, 3), dtype=np.uint8),
            np.arange(37, dtype=np.int64))


def test_train_shuffled_batches(arrays):
    images, labels = arrays
    p = GrainArrayPipeline(images, labels, batch_size=8, is_training=True, seed=1)
    it = iter(p)
    batch = next(it)
    assert batch["image"].shape == (8, 4, 4, 3)
    assert batch["label"].dtype == np.int32
    # images and labels stay paired
    for img, lab in zip(batch["image"], batch["label"]):
        np.testing.assert_array_equal(img, images[lab])
    # an epoch does not repeat records
    seen = list(batch["label"]) + list(next(it)["label"]) + list(next(it)["label"]) + list(next(it)["label"])
    assert len(set(seen)) == 32


def test_eval_single_ordered_pass(arrays):
    images, labels = arrays
    p = GrainArrayPipeline(images, labels, batch_size=8, is_training=False)
    batches = list(iter(p))
    assert len(batches) == 5
    seen = np.concatenate([b["label"] for b in batches])
    assert set(seen[:37]) == set(range(37))
    assert all(b["image"].shape == (8, 4, 4, 3) for b in batches)  # padded tail


def test_determinism_same_seed(arrays):
    images, labels = arrays
    a = next(iter(GrainArrayPipeline(images, labels, 8, True, seed=7)))
    b = next(iter(GrainArrayPipeline(images, labels, 8, True, seed=7)))
    np.testing.assert_array_equal(a["label"], b["label"])


def test_sharding(arrays):
    images, labels = arrays
    s0 = next(iter(GrainArrayPipeline(images, labels, 4, True, seed=3,
                                      shard_index=0, shard_count=2)))
    s1 = next(iter(GrainArrayPipeline(images, labels, 4, True, seed=3,
                                      shard_index=1, shard_count=2)))
    assert set(s0["label"]).isdisjoint(set(s1["label"]))
