"""Ghost (per-data-shard) BN statistics for --global_bn=False on the GSPMD
path — reference resnet.py:73-85 per-replica semantics without shard_map.

Rows are views-major (view0 rows then view1 rows, training/steps.py), so
group g of G = (shard-g chunk of view0) ∪ (shard-g chunk of view1): exactly
the rows a reference replica holds locally (its images' both views).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from simclr_tpu.config import Config
from simclr_tpu.models.model import SimCLRModel
from simclr_tpu.ops.fused_bn import bn_train
from simclr_tpu.parallel import mesh as mesh_lib
from simclr_tpu.training import trainer


def _group_rows(x, g, groups, views):
    """Rows of group g: chunk g of each view half (views-major layout)."""
    n = x.shape[0]
    chunk = n // (views * groups)
    halves = np.split(np.asarray(x), views, axis=0)
    return np.concatenate([h[g * chunk:(g + 1) * chunk] for h in halves], axis=0)


def test_grouped_bn_train_matches_per_group_oracle():
    """bn_train(stat_groups=G) == running ungrouped bn_train on each group's
    rows independently (forward, running stats, and all gradients)."""
    rng = np.random.RandomState(0)
    G, V = 4, 2
    x = jnp.asarray(rng.randn(16, 3, 3, 5).astype(np.float32))
    scale = jnp.asarray(rng.rand(5).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(5).astype(np.float32))
    eps = 1e-5

    def grouped(x, scale, bias):
        y, mean, var = bn_train(x, scale, bias, eps, None, G, V)
        return y, mean, var

    y, mean, var = grouped(x, scale, bias)

    # Oracle: per-group ungrouped bn_train.
    y_parts, means, vars_ = [], [], []
    for g in range(G):
        xg = jnp.asarray(_group_rows(x, g, G, V))
        yg, mg, vg = bn_train(xg, scale, bias, eps, None, 1, 1)
        y_parts.append(np.asarray(yg))
        means.append(np.asarray(mg))
        vars_.append(np.asarray(vg))
    for g in range(G):
        np.testing.assert_allclose(
            _group_rows(y, g, G, V), y_parts[g], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(mean, np.mean(means, 0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(var, np.mean(vars_, 0), rtol=1e-5, atol=1e-6)

    # Gradients: d sum(y * w) for a fixed random cotangent w.
    w = jnp.asarray(rng.randn(*x.shape).astype(np.float32))

    def loss_grouped(x, scale, bias):
        y, _, _ = bn_train(x, scale, bias, eps, None, G, V)
        return jnp.sum(y * w)

    gx, gs, gb = jax.grad(loss_grouped, argnums=(0, 1, 2))(x, scale, bias)

    gx_o = np.zeros_like(np.asarray(x))
    gs_o = np.zeros_like(np.asarray(scale))
    gb_o = np.zeros_like(np.asarray(bias))
    chunk = x.shape[0] // (V * G)
    for g in range(G):
        xg = jnp.asarray(_group_rows(x, g, G, V))
        wg = jnp.asarray(_group_rows(w, g, G, V))

        def loss_local(x, scale, bias):
            y, _, _ = bn_train(x, scale, bias, eps, None, 1, 1)
            return jnp.sum(y * wg)

        dxg, dsg, dbg = jax.grad(loss_local, argnums=(0, 1, 2))(xg, scale, bias)
        dxg = np.asarray(dxg)
        for v in range(V):
            rows = slice(v * x.shape[0] // V + g * chunk,
                         v * x.shape[0] // V + (g + 1) * chunk)
            gx_o[rows] = dxg[v * chunk:(v + 1) * chunk]
        gs_o += np.asarray(dsg)
        gb_o += np.asarray(dbg)
    np.testing.assert_allclose(gx, gx_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gs, gs_o, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gb, gb_o, rtol=1e-4, atol=1e-4)


def test_ghost_bn_model_matches_per_replica_oracle():
    """SimCLRModel with bn_stat_groups=G under one jit == applying the same
    model (groups=1) independently to each replica's local rows."""
    G, V = 4, 2
    cfg = dict(num_classes=10, resnet_depth=18, cifar_stem=True,
               train_mode="pretrain", lineareval_while_pretraining=True,
               fused_bn=True)
    model_g = SimCLRModel(bn_stat_groups=G, **cfg)
    model_l = SimCLRModel(bn_stat_groups=1, **cfg)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(16, 32, 32, 3).astype(np.float32))  # 2V x 8 imgs
    variables = model_g.init(jax.random.PRNGKey(0), x[:4], train=False)

    (proj_g, sup_g), mut_g = model_g.apply(
        variables, x, train=True, mutable=["batch_stats"])

    projs, sups, muts = [], [], []
    for g in range(G):
        xg = jnp.asarray(_group_rows(x, g, G, V))
        (p, s), m = model_l.apply(variables, xg, train=True,
                                  mutable=["batch_stats"])
        projs.append(np.asarray(p))
        sups.append(np.asarray(s))
        muts.append(m["batch_stats"])

    for g in range(G):
        np.testing.assert_allclose(
            _group_rows(proj_g, g, G, V), projs[g], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            _group_rows(sup_g, g, G, V), sups[g], rtol=2e-4, atol=2e-4)

    # Moving statistics = group average (shard_map pmean-merge semantics).
    avg = jax.tree.map(lambda *xs: np.mean(xs, 0), *muts)
    flat_g = jax.tree_util.tree_leaves_with_path(mut_g["batch_stats"])
    flat_o = dict(jax.tree_util.tree_leaves_with_path(avg))
    assert flat_g
    for path, leaf in flat_g:
        np.testing.assert_allclose(leaf, flat_o[path], rtol=1e-4, atol=1e-5,
                                   err_msg=str(path))


def test_trainer_wires_ghost_bn_from_mesh():
    config = Config(dataset="synthetic", image_size=32, resnet_depth=18,
                    train_batch_size=16, global_bn=False, optimizer="lars",
                    compute_dtype="float32", train_mode="pretrain")
    mesh = mesh_lib.create_mesh(config)
    assert mesh_lib.num_batch_shards(mesh) == 8  # conftest virtual devices
    model, _, _ = trainer.build_model_and_optimizer(config, 256, 10, mesh=mesh)
    assert model.bn_stat_groups == 8
    # global_bn=True keeps global statistics.
    model, _, _ = trainer.build_model_and_optimizer(
        config.replace(global_bn=True), 256, 10, mesh=mesh)
    assert model.bn_stat_groups == 1
    # shard_map path keeps its per-replica local-BN mechanism.
    model, _, _ = trainer.build_model_and_optimizer(
        config.replace(use_shard_map=True), 256, 10, mesh=mesh)
    assert model.bn_stat_groups == 1


@pytest.mark.slow
def test_gspmd_ghost_bn_step_runs_on_mesh():
    """Full GSPMD train step with global_bn=False: ghost-BN model compiles
    and steps on the 8-device mesh; moving stats move and differ from the
    global-BN run (the flag has observable behavior)."""
    from simclr_tpu.optim.builder import masked, trainable_mask
    from simclr_tpu.training.steps import make_train_step

    base = Config(dataset="synthetic", image_size=32, resnet_depth=18,
                  train_batch_size=16, warmup_epochs=0, optimizer="lars",
                  compute_dtype="float32", use_blur=False,
                  train_mode="pretrain")
    mesh = mesh_lib.create_mesh(base)
    stats = {}
    for global_bn in (True, False):
        config = base.replace(global_bn=global_bn)
        model, tx, lr_fn = trainer.build_model_and_optimizer(
            config, 256, 10, mesh=mesh)
        state = trainer.init_state(config, model, tx, mesh, (32, 32, 3))
        mask = trainable_mask(config, state.params)
        step = jax.jit(make_train_step(config, model, masked(tx, mask), lr_fn))
        batch = {
            "image": np.random.RandomState(0).randint(
                0, 256, size=(16, 32, 32, 3), dtype=np.uint8),
            "label": np.random.RandomState(1).randint(0, 10, size=(16,)).astype(np.int32),
        }
        batch = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
                 for k, v in batch.items()}
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["train/total_loss"]))
        stats[global_bn] = jax.device_get(
            new_state.batch_stats["resnet"]["initial_bn"]["batch_norm"]["var"])
    # Per-replica variance excludes the between-replica term: not equal to
    # the global-statistics variance.
    assert not np.allclose(stats[True], stats[False])


def test_ghost_bn_finetune_single_view_oracle():
    """Finetune models have one view (stat_views=1): groups are plain
    contiguous row chunks; per-group oracle equality."""
    G = 4
    cfg = dict(num_classes=10, resnet_depth=18, cifar_stem=True,
               train_mode="finetune", fine_tune_after_block=-1,
               fused_bn=True)
    model_g = SimCLRModel(bn_stat_groups=G, **cfg)
    model_l = SimCLRModel(bn_stat_groups=1, **cfg)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(8, 32, 32, 3).astype(np.float32))
    variables = model_g.init(jax.random.PRNGKey(0), x[:2], train=False)

    (_, sup_g), _ = model_g.apply(variables, x, train=True,
                                  mutable=["batch_stats"])
    chunk = x.shape[0] // G
    for g in range(G):
        xg = x[g * chunk:(g + 1) * chunk]
        (_, sup_l), _ = model_l.apply(variables, xg, train=True,
                                      mutable=["batch_stats"])
        np.testing.assert_allclose(sup_g[g * chunk:(g + 1) * chunk],
                                   np.asarray(sup_l), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_kitchen_sink_composition_step(monkeypatch):
    """Feature-composition smoke: R50+SK+SE encoder, ghost BN
    (global_bn=false), fused NT-Xent (interpreted), FSDP param sharding and
    remat_until_block=2 — all in ONE GSPMD step on the 8-device mesh."""
    from simclr_tpu.ops import ntxent_pallas as np_mod
    from simclr_tpu.optim.builder import masked, trainable_mask
    from simclr_tpu.training.steps import make_train_step

    monkeypatch.setattr(np_mod, "_FORCE_INTERPRET", True)
    config = Config(dataset="synthetic", image_size=32, resnet_depth=50,
                    sk_ratio=0.0625, se_ratio=0.25, train_batch_size=16,
                    warmup_epochs=0, optimizer="lars",
                    compute_dtype="float32", use_blur=False,
                    train_mode="pretrain", global_bn=False, fsdp=True,
                    remat_until_block=2, use_fused_ntxent=True)
    mesh = mesh_lib.create_mesh(config)
    model, tx, lr_fn = trainer.build_model_and_optimizer(config, 256, 10,
                                                         mesh=mesh)
    assert model.bn_stat_groups == 8
    state = trainer.init_state(config, model, tx, mesh, (32, 32, 3))
    mask = trainable_mask(config, state.params)
    step = jax.jit(make_train_step(config, model, masked(tx, mask), lr_fn,
                                   mesh=mesh))
    batch = {
        "image": np.random.RandomState(0).randint(
            0, 256, size=(16, 32, 32, 3), dtype=np.uint8),
        "label": np.random.RandomState(1).randint(0, 10, size=(16,)).astype(np.int32),
    }
    batch = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
             for k, v in batch.items()}
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["train/total_loss"]))
    assert "train/contrast_acc" in metrics
    # FSDP actually sharded something (dims >= 1024, e.g. the 2048-wide
    # projection-head dense kernels).
    sharded = [leaf for leaf in jax.tree.leaves(new_state.params)
               if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated]
    assert sharded
