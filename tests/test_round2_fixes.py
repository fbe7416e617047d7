"""Round-2 correctness fixes: variable_schema regex semantics, warm-start
from a bare step dir, masked contrastive eval loss, loop-mean metrics, and
resumable data iteration (VERDICT.md round-1 items 8/10 + ADVICE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simclr_tpu.config import Config
from simclr_tpu.objectives import ntxent
from simclr_tpu.training.checkpoint import schema_matcher


# ---------------------------------------------------------------------------
# variable_schema (TF1 re.match semantics, model.py:165-168)
# ---------------------------------------------------------------------------

def test_schema_default_excludes_global_step():
    m = schema_matcher(r"?!global_step")
    assert m("base_model/conv2d/kernel")
    assert m("head_supervised/dense/kernel")
    assert not m("global_step")


def test_schema_negative_lookahead_user_supplied():
    m = schema_matcher(r"?!head_supervised")
    assert m("base_model/conv2d/kernel")
    assert not m("head_supervised/dense/kernel")


def test_schema_is_match_anchored_not_search():
    m = schema_matcher(r"base_model/.*")
    assert m("base_model/conv2d/kernel")
    assert not m("other/base_model/conv2d/kernel")  # re.match, not re.search


def test_schema_invalid_regex_raises_value_error():
    with pytest.raises(ValueError):
        schema_matcher(r"(unclosed")


# ---------------------------------------------------------------------------
# Masked contrastive loss (eval padding, TF1 data.py:31-100)
# ---------------------------------------------------------------------------

def test_ntxent_weights_make_padding_invisible():
    rng = np.random.RandomState(0)
    b_valid, b_pad, d = 5, 3, 16
    valid = rng.randn(2 * b_valid, d).astype(np.float32)
    v1, v2 = valid[:b_valid], valid[b_valid:]
    # Pad by repeating the first pair (loader tail-padding behavior).
    p1 = np.concatenate([v1, np.repeat(v1[:1], b_pad, 0)])
    p2 = np.concatenate([v2, np.repeat(v2[:1], b_pad, 0)])
    padded = np.concatenate([p1, p2])
    weights = np.concatenate([np.ones(b_valid), np.zeros(b_pad)]).astype(np.float32)

    loss_ref, _, _ = ntxent.add_contrastive_loss(jnp.asarray(valid), temperature=0.5)
    loss_masked, _, _ = ntxent.add_contrastive_loss(
        jnp.asarray(padded), temperature=0.5, weights=jnp.asarray(weights)
    )
    np.testing.assert_allclose(float(loss_masked), float(loss_ref), rtol=1e-5)


def test_ntxent_all_ones_weights_equal_unweighted():
    rng = np.random.RandomState(1)
    h = jnp.asarray(rng.randn(12, 8).astype(np.float32))
    l0, _, _ = ntxent.add_contrastive_loss(h, temperature=0.3)
    l1, _, _ = ntxent.add_contrastive_loss(h, temperature=0.3, weights=jnp.ones(6))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)


# ---------------------------------------------------------------------------
# Loop-mean metrics (reference tf2/run.py:534-549)
# ---------------------------------------------------------------------------

def test_multi_step_reports_loop_means_and_last_lr():
    from simclr_tpu.training.steps import make_multi_step

    def fake_step(state, batch, rng):
        new_state = state + 1
        metrics = {"train/total_loss": batch["x"],
                   "learning_rate": new_state.astype(jnp.float32)}
        return new_state, metrics

    multi = make_multi_step(fake_step, steps=4)
    xs = jnp.asarray([1.0, 2.0, 3.0, 6.0])
    state, metrics = jax.jit(multi)(jnp.int32(0), {"x": xs}, jax.random.PRNGKey(0))
    assert int(state) == 4
    np.testing.assert_allclose(float(metrics["train/total_loss"]), 3.0)
    np.testing.assert_allclose(float(metrics["learning_rate"]), 4.0)


# ---------------------------------------------------------------------------
# Resumable iteration (ADVICE.md trainer.py:114)
# ---------------------------------------------------------------------------

def _take(it, n):
    out = []
    for _ in range(n):
        out.append(next(it))
    return out


def test_array_dataset_resume_continues_sequence():
    from simclr_tpu.data.loader import ArrayDataset

    images = np.arange(40 * 2 * 2 * 1, dtype=np.uint8).reshape(40, 2, 2, 1)
    labels = np.arange(40)
    a = ArrayDataset(images, labels, batch_size=8, is_training=True, seed=3)
    full = _take(iter(a), 12)

    b = ArrayDataset(images, labels, batch_size=8, is_training=True, seed=3)
    b.set_start_step(7)
    resumed = _take(iter(b), 5)
    for got, want in zip(resumed, full[7:]):
        np.testing.assert_array_equal(got["label"], want["label"])
        np.testing.assert_array_equal(got["image"], want["image"])


def test_array_dataset_epochs_use_distinct_permutations():
    from simclr_tpu.data.loader import ArrayDataset

    images = np.zeros((32, 1, 1, 1), np.uint8)
    labels = np.arange(32)
    a = ArrayDataset(images, labels, batch_size=8, is_training=True, seed=0)
    batches = _take(iter(a), 8)  # two epochs
    ep0 = np.concatenate([b["label"] for b in batches[:4]])
    ep1 = np.concatenate([b["label"] for b in batches[4:]])
    assert sorted(ep0) == sorted(ep1) == list(range(32))
    assert not np.array_equal(ep0, ep1)


def test_synthetic_dataset_resume_continues_sequence():
    from simclr_tpu.data.loader import SyntheticDataset

    config = Config(dataset="synthetic", image_size=32, train_batch_size=4)
    a = SyntheticDataset(config, True, num_examples=64)
    full = _take(iter(a), 6)
    b = SyntheticDataset(config, True, num_examples=64)
    b.set_start_step(4)
    resumed = _take(iter(b), 2)
    for got, want in zip(resumed, full[4:]):
        np.testing.assert_array_equal(got["image"], want["image"])
        np.testing.assert_array_equal(got["label"], want["label"])


# ---------------------------------------------------------------------------
# Warm start from a bare step directory (ADVICE.md checkpoint.py:94)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_warm_start_from_step_dir(tmp_path):
    from simclr_tpu.optim.builder import build_optimizer
    from simclr_tpu.optim.schedule import warmup_cosine_schedule
    from simclr_tpu.parallel import mesh as mesh_lib
    from simclr_tpu.training import checkpoint as ckpt_lib
    from simclr_tpu.training import trainer

    config = Config(dataset="synthetic", num_images_default=32, image_size=32,
                    resnet_depth=18, train_batch_size=8, train_steps=1,
                    warmup_epochs=0, compute_dtype="float32",
                    model_dir=str(tmp_path / "m"))
    mesh = mesh_lib.create_mesh(config)
    model, tx, _ = trainer.build_model_and_optimizer(config, 32, 10)
    state = trainer.init_state(config, model, tx, mesh, (32, 32, 3))
    manager = ckpt_lib.create_manager(config.model_dir)
    state = state.replace(step=jnp.int32(7))
    ckpt_lib.save(manager, state)

    # Point --checkpoint at the specific step directory, not the run root.
    step_dir = str(tmp_path / "m" / "7")
    import os
    assert os.path.isdir(step_dir), sorted(os.listdir(config.model_dir))
    state2 = trainer.init_state(config, model, tx, mesh, (32, 32, 3))
    restored = ckpt_lib.warm_start(config, state2, step_dir)
    leaf0 = jax.tree_util.tree_leaves(state.params)[0]
    leaf1 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(leaf0), np.asarray(leaf1))


# ---------------------------------------------------------------------------
# --input_pipeline dispatch (VERDICT round-1 item 9)
# ---------------------------------------------------------------------------

def test_build_dataset_dispatches_all_backends():
    from simclr_tpu.data import loader

    base = Config(dataset="synthetic", num_images_default=32, image_size=32,
                  train_batch_size=8)
    ds_py, _ = loader.build_dataset(base, is_training=True)
    assert type(ds_py).__name__ == "SyntheticDataset"

    ds_native, _ = loader.build_dataset(
        base.replace(input_pipeline="native"), is_training=True)
    assert type(ds_native).__name__ == "NativeArrayPipeline"

    ds_grain, _ = loader.build_dataset(
        base.replace(input_pipeline="grain"), is_training=True)
    assert type(ds_grain).__name__ == "GrainArrayPipeline"

    with pytest.raises(ValueError):
        loader.build_dataset(base.replace(input_pipeline="bogus"), is_training=True)


@pytest.mark.slow
@pytest.mark.parametrize("pipeline", ["python", "native", "grain"])
def test_train_step_through_each_pipeline(tmp_path, pipeline):
    from simclr_tpu.training import trainer

    config = Config(dataset="synthetic", num_images_default=32, image_size=32,
                    resnet_depth=18, train_batch_size=8, train_steps=1,
                    warmup_epochs=0, compute_dtype="float32", use_blur=False,
                    input_pipeline=pipeline,
                    model_dir=str(tmp_path / f"m_{pipeline}"))
    state = trainer.train(config)
    assert int(jax.device_get(state.step)) == 1


# ---------------------------------------------------------------------------
# Scale-safe inner loop (VERDICT round-1 item 4 / weak 2)
# ---------------------------------------------------------------------------

def test_steps_per_loop_memory_budget():
    from simclr_tpu.training.trainer import choose_steps_per_loop

    # Reference-scale config: batch 4096 x 256^2x3 uint8 canvas = ~805 MB per
    # staged batch -> the 1 GB default budget forces per-step dispatch.
    config = Config(train_batch_size=4096, steps_per_loop=64)
    batch_bytes = 4096 * 256 * 256 * 3
    assert choose_steps_per_loop(config, 10_000, 1000, batch_bytes) == 1

    # Bench-scale config: tiny batches keep the requested loop length.
    small = Config(train_batch_size=16, steps_per_loop=64)
    assert choose_steps_per_loop(small, 10_000, 1000, 16 * 32 * 32 * 3) == 64

    # Budget scales: doubling the budget doubles the cap.
    config2 = config.replace(loop_staging_budget_mb=2048)
    assert choose_steps_per_loop(config2, 10_000, 1000, batch_bytes) == 2

    # Never exceeds total steps / requested spl.
    assert choose_steps_per_loop(small, 3, 1000, 100) == 3


def test_resolve_use_fused_ntxent_auto():
    """'auto' is keyed to the SHARDED island tile (VERDICT r4 #6): the
    kernel wins only once the per-device (2N/n_dev, 2N) logits block
    reaches ~16M elements (tools/exp_ntxent_island.py ladder, v5e
    2026-08-19); explicit strings and bools pass through."""
    from simclr_tpu.config import Config, resolve_use_fused_ntxent

    big = Config(train_batch_size=4096)          # 2N = 8192
    small = Config(train_batch_size=1024)        # 2N = 2048
    # single chip: full square tile — 8192^2 = 67M on, 2048^2 = 4M off
    assert resolve_use_fused_ntxent(big, 1) is True
    assert resolve_use_fused_ntxent(small, 1) is False
    # 2N = 4096 single chip: 4096^2 = 16.8M — newly ON (measured 1.16x)
    assert resolve_use_fused_ntxent(Config(train_batch_size=2048), 1) is True
    # flagship sharding (batch 4096 over 32 chips): per-shard tile is
    # 256 x 8192 = 2M — measured parity, gate backs off
    assert resolve_use_fused_ntxent(big, 32) is False
    # 8 chips: 1024 x 8192 = 8.4M — the one measured dense WIN, off
    assert resolve_use_fused_ntxent(big, 8) is False
    # 4 chips: 2048 x 8192 = 16.8M — 1.11x, on
    assert resolve_use_fused_ntxent(big, 4) is True
    assert resolve_use_fused_ntxent(
        big.replace(use_shard_map=True), 4) is True
    # explicit values win
    assert resolve_use_fused_ntxent(
        small.replace(use_fused_ntxent="true"), 1) is True
    assert resolve_use_fused_ntxent(
        big.replace(use_fused_ntxent="false"), 1) is False
    assert resolve_use_fused_ntxent(
        big.replace(use_fused_ntxent=True), 8) is True
