"""Distributed-correctness: the full pretrain train step over an 8-device
mesh must match the same step on a single device bit-for-bit (up to fp
reassociation) — covering sync-BN via GSPMD, global NT-Xent negatives, and
gradient reduction (SURVEY.md §4 'single==multi equivalence')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simclr_tpu.config import Config
from simclr_tpu.optim.builder import masked, trainable_mask
from simclr_tpu.parallel import mesh as mesh_lib
from simclr_tpu.training import trainer
from simclr_tpu.training.steps import make_train_step


def _setup(config, devices):
    mesh = Mesh(np.array(devices).reshape(len(devices)), ("data",))
    model, tx, lr_fn = trainer.build_model_and_optimizer(config, 256, 10)
    state = trainer.init_state(config, model, tx, mesh, (32, 32, 3))
    mask = trainable_mask(config, state.params)
    step = jax.jit(make_train_step(config, model, masked(tx, mask), lr_fn))
    return mesh, state, step


@pytest.mark.slow
def test_train_step_single_vs_eight_devices():
    config = Config(
        dataset="synthetic", image_size=32, resnet_depth=18,
        train_batch_size=16, warmup_epochs=0, optimizer="lars",
        compute_dtype="float32", use_blur=False, train_mode="pretrain",
    )
    rng = np.random.RandomState(0)
    batch_np = {
        "image": rng.randint(0, 256, size=(16, 32, 32, 3), dtype=np.uint8),
        "label": rng.randint(0, 10, size=(16,)).astype(np.int32),
    }
    base_rng = jax.random.PRNGKey(7)

    # single device
    mesh1, state1, step1 = _setup(config, jax.devices()[:1])
    b1 = {k: jax.device_put(v, NamedSharding(mesh1, P("data"))) for k, v in batch_np.items()}
    new1, m1 = step1(state1, b1, base_rng)

    # eight devices
    mesh8, state8, step8 = _setup(config, jax.devices())
    b8 = {k: jax.device_put(v, NamedSharding(mesh8, P("data"))) for k, v in batch_np.items()}
    new8, m8 = step8(state8, b8, base_rng)

    np.testing.assert_allclose(
        float(m1["train/total_loss"]), float(m8["train/total_loss"]), rtol=1e-4
    )
    # parameters after one update agree
    l1 = jax.tree_util.tree_leaves(jax.device_get(new1.params))
    l8 = jax.tree_util.tree_leaves(jax.device_get(new8.params))
    worst = max(np.max(np.abs(a - b)) for a, b in zip(l1, l8))
    assert worst < 5e-4, worst
    # BN stats (the sync-BN psum path) agree
    s1 = jax.tree_util.tree_leaves(jax.device_get(new1.batch_stats))
    s8 = jax.tree_util.tree_leaves(jax.device_get(new8.batch_stats))
    worst = max(np.max(np.abs(a - b)) for a, b in zip(s1, s8))
    assert worst < 5e-4, worst


@pytest.mark.slow
def test_dcn_hybrid_mesh_matches_flat_mesh():
    """2x4 ('dcn','data') hybrid mesh == flat 8-device mesh: the GSPMD
    program is semantically the global-batch computation either way, so one
    train step must produce identical loss/params (SURVEY §5 multi-slice)."""
    from simclr_tpu.optim.builder import masked, trainable_mask
    from simclr_tpu.training import trainer
    from simclr_tpu.training.steps import make_train_step

    base = Config(dataset="synthetic", image_size=32, resnet_depth=18,
                  train_batch_size=16, warmup_epochs=0, optimizer="lars",
                  compute_dtype="float32", use_blur=False, train_mode="pretrain")
    rng = np.random.RandomState(0)
    batch_np = {
        "image": rng.randint(0, 256, size=(16, 32, 32, 3), dtype=np.uint8),
        "label": rng.randint(0, 10, size=(16,)).astype(np.int32),
    }
    results = {}
    for dcn in (1, 2):
        config = base.replace(dcn_data_parallelism=dcn)
        mesh = mesh_lib.create_mesh(config)
        if dcn == 2:
            assert mesh.axis_names == ("dcn", "data")
            assert dict(mesh.shape) == {"dcn": 2, "data": 4}
        model, tx, lr_fn = trainer.build_model_and_optimizer(config, 64, 10)
        state = trainer.init_state(config, model, tx, mesh, (32, 32, 3))
        mask = trainable_mask(config, state.params)
        step = jax.jit(make_train_step(config, model, masked(tx, mask), lr_fn))
        batch = {k: jax.device_put(v, mesh_lib.batch_sharding(mesh))
                 for k, v in batch_np.items()}
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
        results[dcn] = (new_state, float(metrics["train/total_loss"]))
    np.testing.assert_allclose(results[1][1], results[2][1], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(results[1][0].params),
                    jax.tree_util.tree_leaves(results[2][0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_dcn_mesh_batch_sharding_spans_both_axes():
    config = Config(dcn_data_parallelism=2)
    mesh = mesh_lib.create_mesh(config)
    assert mesh_lib.batch_axes(mesh) == ("dcn", "data")
    sh = mesh_lib.batch_sharding(mesh)
    assert sh.spec == jax.sharding.PartitionSpec(("dcn", "data"))
    with pytest.raises(ValueError):
        mesh_lib.create_mesh(Config(dcn_data_parallelism=3))
