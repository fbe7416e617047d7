"""Fused crop+color Pallas kernel under multi-device GSPMD.

The XLA partitioner cannot shard a pallas_call: inside a jit over a
multi-device mesh the kernel would be replicated — every chip would
all-gather the batch and re-augment the FULL global batch.  The island in
color_pipeline_pallas._fused_crop_sharded instead runs the kernel per batch
shard via shard_map, with all randomness tables drawn globally by the
caller — so the sharded result must be BIT-identical to the single-shard
call for every input layout (two-view pretrain, host-cropped pretrain,
finetune crop-only).  Verified here in interpreter mode on the virtual
8-device CPU mesh (tests/conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simclr_tpu.ops import augment

IMPL = "pallas_interpret"


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))


def _sharded(mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def test_two_view_island_bit_identical(mesh):
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (16, 40, 40, 3)).astype(np.uint8)
    key = jax.random.PRNGKey(7)

    def run(imgs, m):
        return augment.two_view_pretrain_batch(
            imgs, key, 32, 32, color_jitter_strength=1.0, use_blur=True,
            color_impl=IMPL, mesh=m)

    ref = jax.jit(lambda im: run(im, None))(jnp.asarray(x))
    out = jax.jit(lambda im: run(im, mesh))(_sharded(mesh, x))
    assert out.shape == (32, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_host_cropped_island_bit_identical(mesh):
    rng = np.random.RandomState(1)
    x = (rng.rand(16, 2, 32, 32, 3) * 0.9).astype(np.float32)
    key = jax.random.PRNGKey(3)

    def run(imgs, m):
        return augment.two_view_pretrain_batch(
            imgs, key, 32, 32, color_jitter_strength=0.5, use_blur=False,
            color_impl=IMPL, host_cropped=True, mesh=m)

    ref = jax.jit(lambda im: run(im, None))(jnp.asarray(x))
    out = jax.jit(lambda im: run(im, mesh))(_sharded(mesh, x))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_finetune_crop_island_bit_identical(mesh):
    rng = np.random.RandomState(2)
    x = rng.randint(0, 256, (16, 40, 40, 3)).astype(np.uint8)
    key = jax.random.PRNGKey(11)

    def run(imgs, m):
        return augment.preprocess_for_train(
            imgs.astype(jnp.float32) / 255.0, key, 32, 32,
            color_jitter_strength=0.0, color_impl=IMPL, mesh=m)

    ref = jax.jit(lambda im: run(im, None))(jnp.asarray(x))
    out = jax.jit(lambda im: run(im, mesh))(_sharded(mesh, x))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_island_falls_through_on_ragged_batch(mesh):
    """Batch not divisible by the shard count: the island must decline and
    the direct (replicated) kernel still produce correct output."""
    rng = np.random.RandomState(3)
    x = rng.randint(0, 256, (12, 40, 40, 3)).astype(np.uint8)  # 12 % 8 != 0
    key = jax.random.PRNGKey(5)

    def run(imgs, m):
        return augment.two_view_pretrain_batch(
            imgs, key, 32, 32, color_jitter_strength=1.0, use_blur=False,
            color_impl=IMPL, mesh=m)

    ref = jax.jit(lambda im: run(im, None))(jnp.asarray(x))
    out = jax.jit(lambda im: run(im, mesh))(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
