"""Spatial partitioning and tensor parallelism under GSPMD.

Both are TPU-native capabilities beyond the reference's pure-DP strategy:

* --spatial_partition=N shards the conv tower's image HEIGHT over a
  'spatial' mesh axis (with_sharding_constraint in steps.make_train_step);
  GSPMD inserts the conv halo exchanges and BN psums.
* a 'model' mesh axis (--mesh_shape=D,M) shards large parameters'
  output-channel dim (parallel/mesh.py::param_spec — weight-stationary
  Megatron TP); GSPMD propagates channel-sharded activations.

Either way the MATH is unchanged — a sharded step must produce the same
loss and parameter update as the pure-DP step up to float reassociation of
the partitioned reductions.  Verified on the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from simclr_tpu.config import Config
from simclr_tpu.optim.builder import masked, trainable_mask
from simclr_tpu.parallel import mesh as mesh_lib
from simclr_tpu.training import trainer
from simclr_tpu.training.steps import make_train_step


def _config(**kw):
    return Config(
        dataset="synthetic", num_images_default=64, image_size=32,
        resnet_depth=18, train_batch_size=16, train_steps=1,
        warmup_epochs=0, optimizer="lars", compute_dtype="float32",
        use_blur=False, model_dir=None, **kw)


def _run_one_step(config, devices=None):
    mesh = mesh_lib.create_mesh(config, devices=devices)
    model, tx, lr_fn = trainer.build_model_and_optimizer(
        config, num_examples=64, num_classes=10, mesh=mesh)
    state = trainer.init_state(config, model, tx, mesh, (32, 32, 3))
    mask = trainable_mask(config, state.params)
    step = jax.jit(make_train_step(config, model, masked(tx, mask), lr_fn,
                                   mesh=mesh))
    batch = {
        "image": np.random.RandomState(0).randint(
            0, 256, size=(16, 32, 32, 3), dtype=np.uint8),
        "label": np.arange(16, dtype=np.int32) % 10,
    }
    batch = {k: jax.device_put(v, mesh_lib.batch_sharding(mesh))
             for k, v in batch.items()}
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    return mesh, state, new_state, jax.device_get(metrics)


def _assert_params_close(a, b, atol):
    fa = jax.tree_util.tree_leaves_with_path(jax.device_get(a))
    fb = jax.tree_util.tree_leaves_with_path(jax.device_get(b))
    for (pa, la), (_, lb) in zip(fa, fb):
        np.testing.assert_allclose(
            la, lb, atol=atol, rtol=1e-5,
            err_msg=jax.tree_util.keystr(pa))


class TestSpatialPartition:
    def test_mesh_axes(self):
        mesh = mesh_lib.create_mesh(_config(spatial_partition=2))
        assert mesh.axis_names == ("data", "spatial")
        assert mesh.shape["spatial"] == 2 and mesh.shape["data"] == 4
        assert mesh_lib.num_batch_shards(mesh) == 4

    def test_rejects_bad_combos(self):
        with pytest.raises(ValueError):
            mesh_lib.create_mesh(_config(spatial_partition=2,
                                         dcn_data_parallelism=2))
        with pytest.raises(ValueError):
            mesh_lib.create_mesh(_config(spatial_partition=3))  # 8 % 3

    def test_step_matches_pure_dp(self):
        _, _, dp_state, dp_metrics = _run_one_step(_config())
        mesh, _, sp_state, sp_metrics = _run_one_step(
            _config(spatial_partition=2))
        assert "spatial" in mesh.axis_names
        np.testing.assert_allclose(sp_metrics["train/total_loss"],
                                   dp_metrics["train/total_loss"],
                                   atol=1e-4, rtol=1e-5)
        _assert_params_close(dp_state.params, sp_state.params, atol=5e-4)

    def test_shard_map_path_refuses(self, tmp_path):
        config = _config(spatial_partition=2, use_shard_map=True).replace(
            model_dir=str(tmp_path))
        with pytest.raises(ValueError, match="data parallelism only"):
            trainer.train(config)


class TestTensorParallel:
    def test_param_spec_shards_output_channels(self):
        mesh = mesh_lib.create_mesh(_config(mesh_shape="4,2"))
        assert mesh.axis_names == ("data", "model")
        big = jnp.zeros((3, 3, 128, 256))  # 294912 elems -> TP
        assert mesh_lib.param_spec(big, mesh) == P(None, None, None, "model")
        small = jnp.zeros((1, 1, 16, 32))
        assert mesh_lib.param_spec(small, mesh) == P()
        vec = jnp.zeros((2048,))  # BN scale: 1-D stays replicated
        assert mesh_lib.param_spec(vec, mesh) == P()

    def test_param_spec_composes_with_fsdp(self):
        mesh = mesh_lib.create_mesh(_config(mesh_shape="4,2"))
        big = jnp.zeros((3, 3, 1024, 512))
        spec = mesh_lib.param_spec(big, mesh, fsdp=True)
        assert spec == P(None, None, "data", "model")

    def test_state_init_is_tp_sharded(self):
        config = _config(mesh_shape="4,2", width_multiplier=2)
        mesh = mesh_lib.create_mesh(config)
        model, tx, _ = trainer.build_model_and_optimizer(
            config, num_examples=64, num_classes=10, mesh=mesh)
        state = trainer.init_state(config, model, tx, mesh, (32, 32, 3))
        specs = [p.sharding.spec
                 for p in jax.tree_util.tree_leaves(state.params)]
        assert any("model" in str(s) for s in specs), specs

    def test_step_matches_pure_dp(self):
        _, _, dp_state, dp_metrics = _run_one_step(
            _config(width_multiplier=2))
        mesh, _, tp_state, tp_metrics = _run_one_step(
            _config(width_multiplier=2, mesh_shape="4,2"))
        assert "model" in mesh.axis_names
        np.testing.assert_allclose(tp_metrics["train/total_loss"],
                                   dp_metrics["train/total_loss"],
                                   atol=1e-4, rtol=1e-5)
        _assert_params_close(dp_state.params, tp_state.params, atol=5e-4)
