"""Equivalence tests for the TPU-perf rewrites: fused-VJP batch norm,
1x1-conv-as-dot, space-to-depth stem, and the batched random-order color
jitter.  Each must be numerically interchangeable with its straightforward
formulation (same parameter trees, same math up to float reassociation) —
the rewrites exist purely to hand XLA better-shaped work (see
ops/fused_bn.py and models/resnet.py rationale comments)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from simclr_tpu.models import resnet as rn
from simclr_tpu.ops import augment, fused_bn


@pytest.fixture
def restore_switches():
    one, s2d, en = rn.ONE_BY_ONE_DOT, rn.STEM_SPACE_TO_DEPTH, fused_bn.is_enabled()
    yield
    rn.ONE_BY_ONE_DOT, rn.STEM_SPACE_TO_DEPTH = one, s2d
    fused_bn.set_enabled(en)


class TestFusedBatchNorm:
    def _modules(self, **kw):
        ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5, dtype=jnp.float32, **kw)
        new = fused_bn.FusedBatchNorm(use_running_average=False, momentum=0.9,
                                      epsilon=1e-5, dtype=jnp.float32, **kw)
        return ref, new

    def test_forward_stats_and_grads_match_flax(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(16, 6, 6, 8) * 2 + 0.5, jnp.float32)
        ref, new = self._modules()
        v = ref.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(new.init(jax.random.PRNGKey(0), x)))
        v = jax.tree.map(
            lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size, v)

        yr, mr = ref.apply(v, x, mutable=["batch_stats"])
        yn, mn = new.apply(v, x, mutable=["batch_stats"])
        np.testing.assert_allclose(yr, yn, atol=1e-5)
        for k in ("mean", "var"):
            np.testing.assert_allclose(mr["batch_stats"][k], mn["batch_stats"][k], atol=1e-6)

        def loss(mod, p, xx):
            y, _ = mod.apply({"params": p, "batch_stats": v["batch_stats"]}, xx,
                             mutable=["batch_stats"])
            return jnp.sum(jnp.sin(y) * jnp.arange(y.size).reshape(y.shape) / y.size)

        gr = jax.grad(lambda p: loss(ref, p, x))(v["params"])
        gn = jax.grad(lambda p: loss(new, p, x))(v["params"])
        np.testing.assert_allclose(gr["scale"], gn["scale"], atol=1e-4)
        np.testing.assert_allclose(gr["bias"], gn["bias"], atol=1e-4)
        gxr = jax.grad(lambda xx: loss(ref, v["params"], xx))(x)
        gxn = jax.grad(lambda xx: loss(new, v["params"], xx))(x)
        np.testing.assert_allclose(gxr, gxn, atol=1e-5)

    def test_eval_mode_matches_flax(self):
        x = jnp.asarray(np.random.RandomState(1).randn(8, 4, 4, 6), jnp.float32)
        v = nn.BatchNorm(use_running_average=True).init(jax.random.PRNGKey(0), x)
        er = nn.BatchNorm(use_running_average=True).apply(v, x)
        en = fused_bn.FusedBatchNorm(use_running_average=True).apply(v, x)
        np.testing.assert_allclose(er, en, atol=1e-6)

    def test_shard_map_psum_matches_global(self):
        # Cross-replica statistics over the 'd' axis == single-device global
        # batch (the reference's global BN, resnet.py:37-85).
        from jax.sharding import Mesh, PartitionSpec as P
        x = jnp.asarray(np.random.RandomState(2).randn(16, 4, 4, 8), jnp.float32)
        new = fused_bn.FusedBatchNorm(use_running_average=False)
        v = new.init(jax.random.PRNGKey(0), x)
        y_glob, m_glob = new.apply(v, x, mutable=["batch_stats"])

        bn_ax = fused_bn.FusedBatchNorm(use_running_average=False, axis_name="d")
        mesh = Mesh(np.array(jax.devices()[:4]), ("d",))

        def local_apply(xs):
            y, m = bn_ax.apply(v, xs, mutable=["batch_stats"])
            return y, m["batch_stats"]["mean"], m["batch_stats"]["var"]

        y_sh, mean_sh, var_sh = jax.jit(jax.shard_map(
            local_apply, mesh=mesh, in_specs=P("d"),
            out_specs=(P("d"), P(), P()), check_vma=False))(x)
        np.testing.assert_allclose(y_sh, y_glob, atol=1e-5)
        np.testing.assert_allclose(mean_sh, m_glob["batch_stats"]["mean"], atol=1e-6)
        np.testing.assert_allclose(var_sh, m_glob["batch_stats"]["var"], atol=1e-5)

    def test_init_zero_and_no_center_variants(self):
        x = jnp.asarray(np.random.RandomState(3).randn(8, 4, 4, 6), jnp.float32)
        for kw in ({"use_scale": False}, {"use_bias": False},
                   {"scale_init": nn.initializers.zeros}):
            ref, new = self._modules(**kw)
            v = ref.init(jax.random.PRNGKey(0), x)
            assert (jax.tree_util.tree_structure(v)
                    == jax.tree_util.tree_structure(new.init(jax.random.PRNGKey(0), x)))
            yr, _ = ref.apply(v, x, mutable=["batch_stats"])
            yn, _ = new.apply(v, x, mutable=["batch_stats"])
            np.testing.assert_allclose(yr, yn, atol=1e-5)


class TestConvRewrites:
    def _run(self, x):
        m = rn.ResNet(resnet_depth=50, cifar_stem=False, dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)

        def loss(p):
            (f, _), _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                                x, train=True, mutable=["batch_stats"])
            return jnp.sum(f * jnp.arange(f.size).reshape(f.shape) / f.size)

        (feats, _), _ = m.apply(v, x, train=True, mutable=["batch_stats"])
        return v, feats, jax.grad(loss)(v["params"])

    def test_dot_and_s2d_match_conv_forms(self, restore_switches):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
        rn.ONE_BY_ONE_DOT = False
        rn.STEM_SPACE_TO_DEPTH = False
        v0, y0, g0 = self._run(x)
        rn.ONE_BY_ONE_DOT = True
        rn.STEM_SPACE_TO_DEPTH = True
        v1, y1, g1 = self._run(x)
        assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
        assert (jax.tree.map(lambda a: a.shape, v0)
                == jax.tree.map(lambda a: a.shape, v1))
        np.testing.assert_allclose(y0, y1, atol=1e-4)
        mx = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)))
        assert mx < 5e-4, mx

    def test_s2d_skipped_for_odd_input(self, restore_switches):
        rn.STEM_SPACE_TO_DEPTH = True
        x = jnp.asarray(np.random.RandomState(0).randn(2, 63, 63, 3), jnp.float32)
        m = rn.ResNet(resnet_depth=18, cifar_stem=False, dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        (f, _) = m.apply(v, x, train=False)
        assert f.shape == (2, 512)


class TestBatchedColorJitter:
    def test_matches_vmapped_switch(self):
        rng = np.random.RandomState(1)
        for impl in ("simclrv2", "simclrv1"):
            for strengths in ((0.8, 0.8, 0.8, 0.2), (0.0, 0.8, 0.0, 0.2)):
                x = jnp.asarray(rng.rand(8, 12, 12, 3), jnp.float32)
                key = jax.random.PRNGKey(7)
                b, c, s, h = strengths
                new = augment._color_jitter_rand_batched(x, key, b, c, s, h, impl)
                keys = jax.random.split(key, x.shape[0])
                old = jax.vmap(lambda im, k: augment._color_jitter_rand_single(
                    im, k, b, c, s, h, impl))(x, keys)
                np.testing.assert_allclose(new, old, atol=1e-5)


# --- Pallas fused separable blur (SURVEY N8) ---------------------------------

def test_pallas_blur_matches_xla_path():
    """Blur-only invocation of the fused color kernel == clip(where(sel,
    gaussian_blur, x)) (interpreter on CPU; the TPU path is the same kernel
    compiled by Mosaic — batch_random_blur dispatches to it)."""
    from simclr_tpu.ops.color_pipeline_pallas import fused_color_pipeline

    rng = np.random.RandomState(0)
    b, h, w, c = 4, 64, 64, 3
    x = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    sigmas = jnp.asarray(rng.uniform(0.1, 2.0, (b,)), jnp.float32)
    sel = np.array([True, False, True, False])
    ks = h // 10

    ref = jnp.clip(
        jnp.where(jnp.asarray(sel)[:, None, None, None],
                  augment.gaussian_blur(x, sigmas, ks), x), 0.0, 1.0)
    gates = jnp.stack([jnp.zeros(b, jnp.int32), jnp.zeros(b, jnp.int32),
                       jnp.asarray(sel, jnp.int32)], axis=1)
    out = fused_color_pipeline(
        x, jnp.zeros((b, 4), jnp.int32), jnp.zeros((b, 4), jnp.float32),
        gates, sigmas, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0,
        kernel_size=ks, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)
    # Non-selected images pass through exactly (modulo the clip).
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(jnp.clip(x[1], 0, 1)))


def test_fused_color_pipeline_matches_xla_two_view():
    """two_view_pretrain_batch: fused Pallas color path (interpreter) ==
    XLA path — same key splits, same gating, f32 math (SURVEY N9)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 256, (6, 64, 64, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(42)
    a = augment.two_view_pretrain_batch(x, key, 56, 56, 1.0, True,
                                        color_impl="xla")
    b = augment.two_view_pretrain_batch(x, key, 56, 56, 1.0, True,
                                        color_impl="pallas_interpret")
    # 1e-4: the in-kernel crop's weight build reassociates f32 vs einsum
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), atol=1e-4)
    # and with blur off / different strength
    a = augment.two_view_pretrain_batch(x, key, 56, 56, 0.5, False,
                                        color_impl="xla")
    b = augment.two_view_pretrain_batch(x, key, 56, 56, 0.5, False,
                                        color_impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), atol=1e-4)


def test_fused_crop_color_pipeline_valid_hw():
    """Letterboxed canvases: in-kernel crop samples inside the valid region
    exactly like the XLA crop path (crop geometry parity on non-square
    originals — VERDICT r1 weak #3 contract)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randint(0, 256, (6, 64, 64, 3), dtype=np.uint8))
    vhw = jnp.asarray(rng.randint(32, 65, (6, 2)), jnp.int32)
    key = jax.random.PRNGKey(7)
    a = augment.two_view_pretrain_batch(x, key, 56, 56, 1.0, True,
                                        valid_hw=vhw, color_impl="xla")
    b = augment.two_view_pretrain_batch(x, key, 56, 56, 1.0, True,
                                        valid_hw=vhw,
                                        color_impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), atol=1e-4)


def test_fused_crop_finetune_path():
    """preprocess_for_train (finetune: crop+flip, no jitter) via the fused
    crop kernel == the XLA path (same draws, ~f32-rounding diffs)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randint(0, 256, (5, 64, 64, 3), dtype=np.uint8)
                    ).astype(jnp.float32) / 255.0
    key = jax.random.PRNGKey(11)
    a = augment.preprocess_for_train(x, key, 56, 56, 0.0, color_impl="xla")
    b = augment.preprocess_for_train(x, key, 56, 56, 0.0,
                                     color_impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
