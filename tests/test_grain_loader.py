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
    # batch_size is GLOBAL: each shard yields its half (first-tier loader
    # contract, reference tf2/data.py:43-47 per-replica batch).
    assert len(s0["label"]) == 2 and len(s1["label"]) == 2


def test_exact_resume(arrays):
    """set_start_step(k) continues the EXACT batch sequence an
    uninterrupted run produces — not just the epoch phase (VERDICT r4 #2)."""
    images, labels = arrays
    full = GrainArrayPipeline(images, labels, 8, True, seed=5)
    it = iter(full)
    expect = [next(it)["label"] for _ in range(9)]  # spans an epoch boundary

    resumed = GrainArrayPipeline(images, labels, 8, True, seed=5)
    resumed.set_start_step(6)
    it2 = iter(resumed)
    for k in range(6, 9):
        np.testing.assert_array_equal(next(it2)["label"], expect[k])


def test_exact_resume_sharded(arrays):
    images, labels = arrays
    for shard in (0, 1):
        full = GrainArrayPipeline(images, labels, 8, True, seed=2,
                                  shard_index=shard, shard_count=2)
        expect = [b["label"] for _, b in zip(range(7), iter(full))]
        resumed = GrainArrayPipeline(images, labels, 8, True, seed=2,
                                     shard_index=shard, shard_count=2)
        resumed.set_start_step(4)
        it = iter(resumed)
        for k in range(4, 7):
            np.testing.assert_array_equal(next(it)["label"], expect[k])


def test_eval_index_tags(arrays):
    """Eval rows carry exact global indices; pad rows carry num_examples."""
    images, labels = arrays
    p = GrainArrayPipeline(images, labels, 8, False)
    batches = list(iter(p))
    idx = np.concatenate([b["index"] for b in batches])
    real = idx[idx < 37]
    assert sorted(real) == list(range(37))
    assert np.all(idx[idx >= 37] == 37)  # pad rows masked exactly
    for b in batches:  # tags match the actual rows (labels are arange)
        m = b["index"] < 37
        np.testing.assert_array_equal(b["label"][m], b["index"][m])


def test_eval_sharded_index_and_filler(arrays):
    """2-shard eval: strided grain shards still carry exact global tags,
    cover every example exactly once, and both shards emit the same batch
    count (ragged filler protocol)."""
    images, labels = arrays
    shards = [list(iter(GrainArrayPipeline(images, labels, 8, False,
                                           shard_index=i, shard_count=2)))
              for i in (0, 1)]
    assert len(shards[0]) == len(shards[1])  # same collective step count
    assert all(len(b["label"]) == 4 for s in shards for b in s)
    idx = np.concatenate([b["index"] for s in shards for b in s])
    real = idx[idx < 37]
    assert sorted(real) == list(range(37))  # exactly once, no double count
    for s in shards:
        for b in s:
            m = b["index"] < 37
            np.testing.assert_array_equal(b["label"][m], b["index"][m])


def test_eval_ragged_filler_batches(arrays):
    """33 examples over 2 shards (17/16) at local batch 4: shard 1 is one
    batch short and must emit a fully-masked filler batch so both shards
    join the same number of collective eval steps."""
    images, labels = arrays
    images, labels = images[:33], labels[:33]
    shards = [list(iter(GrainArrayPipeline(images, labels, 8, False,
                                           shard_index=i, shard_count=2)))
              for i in (0, 1)]
    assert len(shards[0]) == 5 and len(shards[1]) == 5
    assert np.all(shards[1][-1]["index"] == 33)  # filler: every row masked
    idx = np.concatenate([b["index"] for s in shards for b in s])
    assert sorted(idx[idx < 33]) == list(range(33))


def test_global_batch_not_divisible_raises(arrays):
    images, labels = arrays
    with pytest.raises(ValueError):
        GrainArrayPipeline(images, labels, 9, True, shard_count=2)


def test_eval_empty_shard_yields_fillers_only(arrays):
    """Ceil-split can leave trailing processes with ZERO records (9 examples
    over 8 shards: shards 5..7 are empty).  Grain's IndexSampler rejects
    0-record sources at construction, so the pipeline must not build one —
    it emits only the fully-masked filler batches every process owes the
    collective eval protocol."""
    images, labels = arrays
    images, labels = images[:9], labels[:9]
    per_shard = []
    for shard in range(8):
        p = GrainArrayPipeline(images, labels, batch_size=8,
                               is_training=False, seed=0,
                               shard_index=shard, shard_count=8)
        batches = list(p)
        per_shard.append(batches)
    # every shard joins the same number of collective steps
    counts = {len(b) for b in per_shard}
    assert counts == {2}  # per = ceil(9/8) = 2, local_bs = 1
    # trailing shards are empty -> all rows masked (index == num_examples)
    for shard in (5, 6, 7):
        for b in per_shard[shard]:
            assert (b["index"] == 9).all()
    # every real example appears exactly once across all shards
    seen = np.concatenate([b["index"] for bs in per_shard for b in bs])
    real = seen[seen < 9]
    np.testing.assert_array_equal(np.sort(real), np.arange(9))


def test_train_fewer_records_than_shards_raises(arrays):
    images, labels = arrays
    with pytest.raises(ValueError, match="record per shard"):
        GrainArrayPipeline(images[:3], labels[:3], batch_size=8,
                           is_training=True, seed=0,
                           shard_index=0, shard_count=8)
