"""Fused NT-Xent (custom-VJP / Pallas-on-TPU) equivalence tests."""

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.objectives.ntxent import add_contrastive_loss
from simclr_tpu.ops.ntxent_pallas import add_contrastive_loss_pallas, ntxent_loss_fused


def test_fused_loss_matches_reference():
    hidden = jax.random.normal(jax.random.PRNGKey(0), (32, 16))
    ref, _, _ = add_contrastive_loss(hidden, temperature=0.3)
    fused = ntxent_loss_fused(hidden, True, 0.3)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5)


def test_fused_grad_matches_reference():
    hidden = jax.random.normal(jax.random.PRNGKey(1), (16, 8))

    def ref_loss(h):
        loss, _, _ = add_contrastive_loss(h, temperature=0.5)
        return loss

    g_ref = jax.grad(ref_loss)(hidden)
    g_fused = jax.grad(lambda h: ntxent_loss_fused(h, True, 0.5))(hidden)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-6)


def test_pallas_wrapper_cpu_fallback():
    hidden = jax.random.normal(jax.random.PRNGKey(2), (24, 12))
    ref, _, _ = add_contrastive_loss(hidden, temperature=0.2)
    out = add_contrastive_loss_pallas(hidden, temperature=0.2)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
