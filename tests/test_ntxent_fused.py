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


def test_streaming_kernels_interpret_mode():
    """The Pallas streaming forward AND backward, run through the Pallas
    interpreter on CPU, must match the dense loss and jax.grad exactly."""
    import jax.numpy as jnp

    from simclr_tpu.ops.ntxent_pallas import (
        _normalize_with_residual, _ntxent_pallas_bwd, _ntxent_pallas_fwd,
    )

    hidden = jax.random.normal(jax.random.PRNGKey(3), (32, 16))
    T = 0.3
    hn, norm = _normalize_with_residual(hidden)
    h1, h2 = jnp.split(hn, 2, axis=0)

    loss_vec, m_a, l_a, m_b, l_b = _ntxent_pallas_fwd(h1, h2, T, interpret=True)
    ref, _, _ = add_contrastive_loss(hidden, temperature=T)
    np.testing.assert_allclose(float(jnp.mean(loss_vec)), float(ref), rtol=1e-6)

    dh1, dh2 = _ntxent_pallas_bwd(h1, h2, m_a, l_a, m_b, l_b, T, interpret=True)
    dhn = jnp.concatenate([dh1, dh2], 0) / h1.shape[0]
    dhidden = (dhn - hn * jnp.sum(hn * dhn, axis=-1, keepdims=True)) / norm

    def f(h):
        loss, _, _ = add_contrastive_loss(h, temperature=T)
        return loss

    g_ref = jax.grad(f)(hidden)
    np.testing.assert_allclose(np.asarray(dhidden), np.asarray(g_ref), atol=1e-6)
