"""Elastic checkpoint/resume: sharded async saves + cross-mesh restores.

The checkpoint layer stores GLOBAL arrays (each process/device writes only
its addressable shards) and restores onto whatever mesh the current run
built (training/checkpoint.py::save/restore) — so a run saved on an
8-device mesh must resume on 4 devices or 1 with only a config change
(replacing the reference's host-assembled TF checkpoints, tf2/run.py:308-337
which are mesh-agnostic by construction but block the train loop to write).

Also pins the async-save snapshot contract: manager.save() must snapshot
device arrays before returning, because the train loop immediately donates
the state buffers to the next step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simclr_tpu.config import Config
from simclr_tpu.optim.builder import masked, trainable_mask
from simclr_tpu.parallel import mesh as mesh_lib
from simclr_tpu.training import checkpoint as ckpt_lib
from simclr_tpu.training import trainer
from simclr_tpu.training.steps import make_train_step


def _make_state(config: Config, n_devices: int):
    mesh = mesh_lib.create_mesh(config, devices=jax.devices()[:n_devices])
    model, tx, lr_fn = trainer.build_model_and_optimizer(config, 256, 10)
    state = trainer.init_state(config, model, tx, mesh, (32, 32, 3))
    return mesh, model, tx, lr_fn, state


def _leaves_equal(a, b):
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(jax.device_get(la)),
                                      np.asarray(jax.device_get(lb)))


CFG = dict(
    dataset="synthetic", image_size=32, resnet_depth=18,
    train_batch_size=16, warmup_epochs=0, optimizer="lars",
    compute_dtype="float32", use_blur=False, train_mode="pretrain",
)


def test_restore_onto_smaller_mesh(tmp_path):
    """Save on 8 devices, resume on 4 and on 1 — values bit-identical,
    restored arrays laid out on the NEW mesh."""
    config = Config(model_dir=str(tmp_path / "run"), **CFG)
    mesh8, model, tx, lr_fn, state8 = _make_state(config, 8)

    # Make the state non-trivial: one real train step on the 8-dev mesh.
    step = jax.jit(make_train_step(config, model, masked(
        tx, trainable_mask(config, state8.params)), lr_fn))
    rng = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(
            rng.randint(0, 256, size=(16, 32, 32, 3), dtype=np.uint8),
            mesh_lib.batch_sharding(mesh8)),
        "label": jax.device_put(rng.randint(0, 10, size=(16,)).astype(np.int32),
                                mesh_lib.batch_sharding(mesh8)),
    }
    state8, _ = step(state8, batch, jax.random.PRNGKey(0))
    saved_params = jax.device_get(state8.params)

    manager = ckpt_lib.create_manager(config.model_dir)
    ckpt_lib.save(manager, state8, wait=True)

    for n in (4, 1):
        mesh_n, _, _, _, fresh = _make_state(config, n)
        restored = ckpt_lib.restore(manager, fresh)
        assert int(jax.device_get(restored.step)) == 1
        _leaves_equal(restored.params, saved_params)
        # Arrays live on the new mesh's devices only.
        leaf = jax.tree_util.tree_leaves(restored.params)[0]
        assert len(leaf.sharding.device_set) == n, (
            n, leaf.sharding.device_set)
        # And training continues on the new mesh.
        batch_n = {k: jax.device_put(jax.device_get(v),
                                     mesh_lib.batch_sharding(mesh_n))
                   for k, v in batch.items()}
        cont, metrics = step(restored, batch_n, jax.random.PRNGKey(1))
        assert int(jax.device_get(cont.step)) == 2
        assert np.isfinite(float(metrics["train/total_loss"]))


@pytest.mark.slow
def test_fsdp_state_roundtrips_across_mesh_sizes(tmp_path):
    """FSDP-sharded params (each device holds 1/8th) save as global arrays
    and restore FSDP-sharded on a 4-device mesh without replication."""
    config = Config(model_dir=str(tmp_path / "run"), fsdp=True,
                    width_multiplier=2, **CFG)
    mesh8, _, _, _, state8 = _make_state(config, 8)
    specs8 = [p.sharding.spec for p in jax.tree_util.tree_leaves(state8.params)]
    assert any("data" in str(s) for s in specs8), specs8
    saved = jax.device_get(state8.params)

    manager = ckpt_lib.create_manager(config.model_dir)
    ckpt_lib.save(manager, state8, wait=True)

    _, _, _, _, fresh4 = _make_state(config, 4)
    restored = ckpt_lib.restore(manager, fresh4)
    _leaves_equal(restored.params, saved)
    # Restored leaves keep the 4-dev FSDP layout of the new state, and no
    # sharded leaf spans more than 4 devices.
    for old, new in zip(jax.tree_util.tree_leaves(fresh4.params),
                        jax.tree_util.tree_leaves(restored.params)):
        assert new.sharding == old.sharding, (new.sharding, old.sharding)


def test_async_save_survives_donation(tmp_path):
    """save(wait=False) then immediately donating the state to the next step
    must not corrupt the in-flight checkpoint (the async manager snapshots
    before returning — trainer.py's loop relies on this)."""
    config = Config(model_dir=str(tmp_path / "run"), **CFG)
    mesh, model, tx, lr_fn, state = _make_state(config, 8)
    step = jax.jit(make_train_step(config, model, masked(
        tx, trainable_mask(config, state.params)), lr_fn),
        donate_argnums=(0,))
    rng = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(
            rng.randint(0, 256, size=(16, 32, 32, 3), dtype=np.uint8),
            mesh_lib.batch_sharding(mesh)),
        "label": jax.device_put(rng.randint(0, 10, size=(16,)).astype(np.int32),
                                mesh_lib.batch_sharding(mesh)),
    }
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    at_save = jax.device_get(state.params)

    manager = ckpt_lib.create_manager(config.model_dir)
    ckpt_lib.save(manager, state, wait=False)
    # Donate the buffers Orbax is (logically) still writing from.
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    manager.wait_until_finished()

    _, _, _, _, fresh = _make_state(config, 8)
    restored = ckpt_lib.restore(manager, fresh)
    assert int(jax.device_get(restored.step)) == 1  # the pre-donation step
    _leaves_equal(restored.params, at_save)
