"""Native C++ pipeline tests: build, determinism, epoch permutation,
eval single-pass with padding, and a torn-batch race check."""

import numpy as np
import pytest

from simclr_tpu.data.native_pipeline import NativeArrayPipeline, NativePipelineUnavailable


@pytest.fixture(scope="module")
def arrays():
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, size=(37, 4, 4, 3), dtype=np.uint8)
    labels = np.arange(37, dtype=np.int64)
    return images, labels


def _make(arrays, **kw):
    images, labels = arrays
    try:
        return NativeArrayPipeline(images, labels, **kw)
    except NativePipelineUnavailable as e:
        pytest.skip(str(e))


def test_train_epoch_is_permutation(arrays):
    p = _make(arrays, batch_size=8, is_training=True, seed=3)
    it = iter(p)
    # 37 // 8 = 4 batches per epoch (drop remainder)
    labels = np.concatenate([next(it)["label"] for _ in range(4)])
    assert len(labels) == 32
    assert len(np.unique(labels)) == 32  # no repeats within an epoch
    # next epoch reshuffles
    labels2 = np.concatenate([next(it)["label"] for _ in range(4)])
    assert not np.array_equal(labels, labels2)
    p.close()


def test_images_match_labels(arrays):
    images, _ = arrays
    p = _make(arrays, batch_size=4, is_training=True, seed=1)
    batch = next(iter(p))
    for img, lab in zip(batch["image"], batch["label"]):
        np.testing.assert_array_equal(img, images[lab])
    p.close()


def test_determinism_same_seed(arrays):
    a = _make(arrays, batch_size=8, is_training=True, seed=7)
    b = _make(arrays, batch_size=8, is_training=True, seed=7)
    la = np.concatenate([next(iter(a))["label"]])
    lb = np.concatenate([next(iter(b))["label"]])
    np.testing.assert_array_equal(la, lb)
    a.close(); b.close()


def test_eval_single_pass(arrays):
    p = _make(arrays, batch_size=8, is_training=False, seed=0)
    batches = list(iter(p))
    assert len(batches) == 5  # ceil(37/8)
    seen = np.concatenate([b["label"] for b in batches])
    assert len(seen) == 40  # padded final batch
    assert set(np.unique(seen)) == set(range(37))
    p.close()


def test_exact_resume(arrays):
    """set_start_step(k) reproduces the exact uninterrupted batch sequence
    (every native batch is a pure function of its global index)."""
    p = _make(arrays, batch_size=8, is_training=True, seed=11)
    it = iter(p)
    expect = [next(it)["label"] for _ in range(9)]  # spans an epoch boundary
    p.close()

    r = _make(arrays, batch_size=8, is_training=True, seed=11)
    r.set_start_step(5)
    it2 = iter(r)
    for k in range(5, 9):
        np.testing.assert_array_equal(next(it2)["label"], expect[k])
    r.close()


def test_set_start_step_after_iteration_raises(arrays):
    p = _make(arrays, batch_size=8, is_training=True, seed=0)
    next(iter(p))
    with pytest.raises(RuntimeError):
        p.set_start_step(3)
    p.close()


def test_eval_index_tags(arrays):
    """Eval is a sequential pass with exact global index tags; pad rows of
    the final batch carry num_examples (mask semantics)."""
    p = _make(arrays, batch_size=8, is_training=False, seed=0)
    batches = list(iter(p))
    idx = np.concatenate([b["index"] for b in batches])
    real = idx[idx < 37]
    np.testing.assert_array_equal(real, np.arange(37))  # sequential
    assert np.all(idx[idx >= 37] == 37)
    for b in batches:  # labels are arange: tag must equal the row's label
        m = b["index"] < 37
        np.testing.assert_array_equal(b["label"][m], b["index"][m])
    p.close()


def test_eval_shard_offset_and_filler(arrays):
    """Multi-process eval contract: per-shard slices with index_offset tag
    GLOBAL indices, and the short shard emits fully-masked filler batches
    up to expected_batches."""
    images, labels = arrays  # 37 examples -> shards of 19 and 18
    per = 19
    shard_batches = []
    for i, (lo, hi) in enumerate(((0, 19), (19, 37))):
        p = _make((images[lo:hi], labels[lo:hi]), batch_size=4,
                  is_training=False, seed=0, index_offset=lo,
                  num_examples_global=37,
                  expected_batches=-(-per // 4))
        shard_batches.append(list(iter(p)))
        p.close()
    assert len(shard_batches[0]) == len(shard_batches[1]) == 5
    idx = np.concatenate([b["index"] for s in shard_batches for b in s])
    assert sorted(idx[idx < 37]) == list(range(37))
    for s in shard_batches:
        for b in s:
            m = b["index"] < 37
            np.testing.assert_array_equal(b["label"][m], b["index"][m])


def test_dispatcher_shards_native_per_process(arrays, monkeypatch):
    """make_array_pipeline hands each process its contiguous slice + local
    batch + eval index metadata (the r4 'full global batch everywhere'
    hole)."""
    import jax

    from simclr_tpu.config import Config
    from simclr_tpu.data import loader as loader_lib

    images, labels = arrays
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    for pidx in (0, 1):
        monkeypatch.setattr(jax, "process_index", lambda p=pidx: p)
        cfg = Config(input_pipeline="native", seed=3)
        try:
            p = loader_lib.make_array_pipeline(cfg, images, labels, 8, False)
        except Exception as e:
            pytest.skip(str(e))
        assert p.batch_size == 4  # local = global // process_count
        assert p.num_examples in (19, 18)
        assert p.index_offset == (0 if pidx == 0 else 19)
        assert p.num_examples_global == 37
        assert p.expected_batches == 5
        p.close()
    # training: sharded slice + decorrelated seed, no index metadata
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    cfg = Config(input_pipeline="native", seed=3)
    p = loader_lib.make_array_pipeline(cfg, images, labels, 8, True)
    assert p.batch_size == 4 and p.num_examples == 18
    batch = next(iter(p))
    assert set(batch["label"]).issubset(set(labels[19:]))  # its shard only
    p.close()


def test_many_batches_no_tearing(arrays):
    """Consume quickly across slot-reuse boundaries; every batch must be
    internally consistent (image i belongs to label i)."""
    images, _ = arrays
    p = _make(arrays, batch_size=8, is_training=True, seed=9, num_threads=3, queue_depth=2)
    it = iter(p)
    for _ in range(50):
        batch = next(it)
        for img, lab in zip(batch["image"], batch["label"]):
            np.testing.assert_array_equal(img, images[lab])
    p.close()
