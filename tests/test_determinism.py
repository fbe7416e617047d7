"""Determinism: identical seeds give identical losses; different seeds give
different augmentation draws."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from simclr_tpu.config import Config
from simclr_tpu.optim.builder import masked, trainable_mask
from simclr_tpu.parallel import mesh as mesh_lib
from simclr_tpu.training import trainer
from simclr_tpu.training.steps import make_train_step


@pytest.mark.slow
def test_same_seed_same_loss():
    config = Config(dataset="synthetic", image_size=32, resnet_depth=18,
                    train_batch_size=16, warmup_epochs=0, optimizer="lars",
                    compute_dtype="float32", use_blur=False, train_mode="pretrain")
    mesh = mesh_lib.create_mesh(config)
    model, tx, lr_fn = trainer.build_model_and_optimizer(config, 256, 10)
    mask_tx = None
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 256, size=(16, 32, 32, 3), dtype=np.uint8),
        "label": rng.randint(0, 10, size=(16,)).astype(np.int32),
    }
    batch = {k: jax.device_put(v, NamedSharding(mesh, P("data"))) for k, v in batch.items()}

    losses = []
    for _ in range(2):
        state = trainer.init_state(config, model, tx, mesh, (32, 32, 3))
        mask = trainable_mask(config, state.params)
        step = jax.jit(make_train_step(config, model, masked(tx, mask), lr_fn))
        for _ in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(5))
        losses.append(float(metrics["train/total_loss"]))
    assert losses[0] == losses[1], losses

    # Different augmentation seed -> different loss.
    state = trainer.init_state(config, model, tx, mesh, (32, 32, 3))
    mask = trainable_mask(config, state.params)
    step = jax.jit(make_train_step(config, model, masked(tx, mask), lr_fn))
    _, metrics = step(state, batch, jax.random.PRNGKey(6))
    assert float(metrics["train/total_loss"]) != losses[0]
