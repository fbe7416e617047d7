"""shard_map train-step tests: equivalence with the GSPMD path under
global_bn, and per-replica-BN support (global_bn=False) which GSPMD cannot
express."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from simclr_tpu.config import Config
from simclr_tpu.optim.builder import masked, trainable_mask
from simclr_tpu.parallel import mesh as mesh_lib
from simclr_tpu.training import trainer
from simclr_tpu.training.steps import make_shard_map_train_step, make_train_step


def _common(config):
    mesh = mesh_lib.create_mesh(config)
    model, tx, lr_fn = trainer.build_model_and_optimizer(config, 256, 10)
    state = trainer.init_state(config, model, tx, mesh, (32, 32, 3))
    mask = trainable_mask(config, state.params)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 256, size=(16, 32, 32, 3), dtype=np.uint8),
        "label": rng.randint(0, 10, size=(16,)).astype(np.int32),
    }
    batch = {k: jax.device_put(v, NamedSharding(mesh, P("data"))) for k, v in batch.items()}
    return mesh, model, masked(tx, mask), lr_fn, state, batch


@pytest.mark.slow
def test_shard_map_step_runs_global_bn():
    config = Config(dataset="synthetic", image_size=32, resnet_depth=18,
                    train_batch_size=16, warmup_epochs=0, optimizer="lars",
                    compute_dtype="float32", use_blur=False,
                    train_mode="pretrain", use_shard_map=True, global_bn=True)
    mesh, model, tx, lr_fn, state, batch = _common(config)
    step = jax.jit(make_shard_map_train_step(config, model, tx, lr_fn, mesh))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["train/total_loss"]))
    assert int(jax.device_get(new_state.step)) == 1
    # Contrastive metrics present (global negatives via all_gather).
    assert "train/contrast_acc" in metrics


@pytest.mark.slow
def test_shard_map_step_local_bn():
    """global_bn=False: per-replica statistics; step must run and produce
    finite loss with pmean-merged moving stats."""
    config = Config(dataset="synthetic", image_size=32, resnet_depth=18,
                    train_batch_size=16, warmup_epochs=0, optimizer="lars",
                    compute_dtype="float32", use_blur=False,
                    train_mode="pretrain", use_shard_map=True, global_bn=False)
    mesh, model, tx, lr_fn, state, batch = _common(config)
    step = jax.jit(make_shard_map_train_step(config, model, tx, lr_fn, mesh))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["train/total_loss"]))
    before = jax.device_get(state.batch_stats["resnet"]["initial_bn"]["batch_norm"]["mean"])
    after = jax.device_get(new_state.batch_stats["resnet"]["initial_bn"]["batch_norm"]["mean"])
    assert not np.allclose(before, after)


@pytest.mark.slow
def test_shard_map_step_fused_ntxent_matches_dense(monkeypatch):
    """--use_fused_ntxent through the shard_map train step (interpreted
    Pallas kernels on the virtual mesh) must produce the same loss/metrics
    and parameter updates as the dense shard_map step."""
    from simclr_tpu.ops import ntxent_pallas as np_mod

    monkeypatch.setattr(np_mod, "_FORCE_INTERPRET", True)
    base = Config(dataset="synthetic", image_size=32, resnet_depth=18,
                  train_batch_size=16, warmup_epochs=0, optimizer="lars",
                  compute_dtype="float32", use_blur=False,
                  train_mode="pretrain", use_shard_map=True, global_bn=True)
    results = {}
    for fused in (False, True):
        config = base.replace(use_fused_ntxent=fused)
        mesh, model, tx, lr_fn, state, batch = _common(config)
        step = jax.jit(make_shard_map_train_step(config, model, tx, lr_fn, mesh))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
        # Scalars only: the step also returns the augmented-view image
        # summary (steps.VIEW_SUMMARY_KEY), which the trainer pops.
        results[fused] = (new_state, {k: float(v) for k, v in metrics.items()
                                      if np.asarray(v).ndim == 0})
    m_dense, m_fused = results[False][1], results[True][1]
    for key in ("train/contrast_loss", "train/contrast_acc",
                "train/contrast_entropy", "train/total_loss"):
        assert key in m_fused, key
        np.testing.assert_allclose(m_fused[key], m_dense[key], rtol=1e-4,
                                   err_msg=key)
    p_dense = jax.tree_util.tree_leaves(results[False][0].params)
    p_fused = jax.tree_util.tree_leaves(results[True][0].params)
    for a, b in zip(p_dense, p_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-6)
