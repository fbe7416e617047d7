"""FSDP (ZeRO-style parameter sharding over the data axis) tests.

Includes the big-model memory plan (VERDICT r2 #8): the reference's largest
released model, ResNet-152 3x+SK (~795M params, README.md:33), must
initialize, shard, and step under --fsdp --remat_until_block=2 on an
8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simclr_tpu.config import Config
from simclr_tpu.optim.builder import masked, trainable_mask
from simclr_tpu.parallel import mesh as mesh_lib
from simclr_tpu.training import trainer
from simclr_tpu.training.steps import make_train_step


@pytest.mark.slow
def test_fsdp_train_step_runs_and_shards():
    # width_multiplier=2 gives 1024-wide group4 convs, above the FSDP
    # size threshold and divisible by the 8-device axis.
    config = Config(
        dataset="synthetic", image_size=32, resnet_depth=18, width_multiplier=2,
        train_batch_size=16, warmup_epochs=0, optimizer="lars",
        compute_dtype="float32", use_blur=False, train_mode="pretrain",
        fsdp=True,
    )
    mesh = mesh_lib.create_mesh(config)
    model, tx, lr_fn = trainer.build_model_and_optimizer(config, 256, 10)
    state = trainer.init_state(config, model, tx, mesh, (32, 32, 3))

    # At least one large parameter must actually be sharded over 'data'.
    shardings = jax.tree_util.tree_leaves(
        jax.tree.map(lambda p: p.sharding.spec, state.params)
    )
    assert any("data" in str(s) for s in shardings), shardings

    mask = trainable_mask(config, state.params)
    step = jax.jit(make_train_step(config, model, masked(tx, mask), lr_fn),
                   donate_argnums=(0,))
    rng = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(
            rng.randint(0, 256, size=(16, 32, 32, 3), dtype=np.uint8),
            mesh_lib.batch_sharding(mesh)),
        "label": jax.device_put(rng.randint(0, 10, size=(16,)).astype(np.int32),
                                mesh_lib.batch_sharding(mesh)),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["train/total_loss"]))
    # Params remain sharded after the update.
    new_shardings = jax.tree_util.tree_leaves(
        jax.tree.map(lambda p: p.sharding.spec, new_state.params)
    )
    assert any("data" in str(s) for s in new_shardings)


@pytest.mark.slow
def test_fsdp_r152_3x_sk_memory_plan():
    """The reference's largest released model — R152 3x+SK, ~795M params
    (README.md:33) — initializes, shards, and steps under
    --fsdp --remat_until_block=2 on the 8-device mesh (VERDICT r2 #8).
    Param/optimizer shards must actually split over 'data' (max per-device
    bytes well under the unsharded total)."""
    config = Config(
        dataset="synthetic", image_size=32, resnet_depth=152,
        width_multiplier=3, sk_ratio=0.0625,
        train_batch_size=8, warmup_epochs=0, optimizer="lars",
        compute_dtype="float32", use_blur=False, color_jitter_strength=0.0,
        train_mode="pretrain", fsdp=True, remat_until_block=2,
    )
    mesh = mesh_lib.create_mesh(config)
    model, tx, lr_fn = trainer.build_model_and_optimizer(config, 256, 10)
    state = trainer.init_state(config, model, tx, mesh, (32, 32, 3))

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))
    # README.md:33: 795M. The CIFAR stem (image_size=32) trims the 7x7 stem
    # only; projection/supervised heads add a little. Require the right
    # order: > 7e8.
    assert n_params > 7e8, f"expected ~795M params, got {n_params / 1e6:.1f}M"

    total_bytes = sum(
        int(np.prod(p.shape)) * p.dtype.itemsize
        for p in jax.tree_util.tree_leaves(state.params))
    per_dev = [0] * len(jax.devices())
    for p in jax.tree_util.tree_leaves(state.params):
        for shard in p.addressable_shards:
            per_dev[shard.device.id] += int(np.prod(shard.data.shape)) * p.dtype.itemsize
    peak = max(per_dev)
    print(f"R152-3x+SK: {n_params / 1e6:.1f}M params, "
          f"{total_bytes / 2**20:.0f} MiB total, "
          f"max per-device param shard {peak / 2**20:.0f} MiB")
    # FSDP must split the bulk of the bytes: max per-device shard well
    # under half the unsharded total (8 devices; small unsharded leaves
    # like BN scales stay replicated).
    assert peak < total_bytes / 2, (peak, total_bytes)

    mask = trainable_mask(config, state.params)
    step = jax.jit(make_train_step(config, model, masked(tx, mask), lr_fn),
                   donate_argnums=(0,))
    rng = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(
            rng.randint(0, 256, size=(8, 32, 32, 3), dtype=np.uint8),
            mesh_lib.batch_sharding(mesh)),
        "label": jax.device_put(rng.randint(0, 10, size=(8,)).astype(np.int32),
                                mesh_lib.batch_sharding(mesh)),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["train/total_loss"]))
    new_shardings = jax.tree_util.tree_leaves(
        jax.tree.map(lambda p: p.sharding.spec, new_state.params))
    assert any("data" in str(s) for s in new_shardings)
