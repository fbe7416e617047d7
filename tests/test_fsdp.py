"""FSDP (ZeRO-style parameter sharding over the data axis) tests."""

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
