"""Generalized contrastive losses ("Intriguing Properties of Contrastive
Losses", reference C20).

JAX re-design of colabs/intriguing_properties/generalized_contrastive_loss
.ipynb (cells 2-3): loss = alignment + lambda * distribution-matching, where
distribution matching is either a decoupled logsumexp repulsion or a
sliced-Wasserstein distance (SWD) to a prior (normal / uniform-cube /
uniform-hypersphere) through a random orthogonal projection.

Configurations (notebook cell 2 docstring):
  * decoupled NT-Xent: dist='logsumexp', hidden_norm=True
  * SWD normal prior:  dist='normal',   hidden_norm=False
  * SWD hypersphere:   dist='normal',   hidden_norm=True
  * SWD hypercube:     dist='uniform',  hidden_norm=False

TPU notes: the notebook's O(n^2)-comparison rank sort is replaced by
jnp.sort (XLA's native bitonic sort) — identical output, far cheaper.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _l2_normalize(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)


def get_logsumexp_loss(states, temperature):
    """Decoupled uniformity term (notebook cell 3)."""
    scores = jnp.matmul(states, states.T, preferred_element_type=jnp.float32)
    bias = jnp.log(jnp.asarray(states.shape[1], jnp.float32))
    return jnp.mean(jax.nn.logsumexp(scores / temperature, axis=1) - bias)


def get_swd_loss(states, rand_w, key, prior="normal", stddev=1.0, hidden_norm=True):
    """Sliced-Wasserstein distance to a prior through projection rand_w."""
    states_proj = jnp.matmul(states, rand_w)
    states_t = jnp.sort(states_proj.T, axis=-1)  # (dim, bsz) row-sorted

    if prior == "normal":
        states_prior = jax.random.normal(key, states.shape) * stddev
    elif prior == "uniform":
        states_prior = jax.random.uniform(key, states.shape, minval=-stddev, maxval=stddev)
    else:
        raise ValueError(f"Unknown prior {prior}")
    if hidden_norm:
        states_prior = _l2_normalize(states_prior)
    prior_t = jnp.sort(jnp.matmul(states_prior, rand_w).T, axis=-1)
    return jnp.mean((prior_t - states_t) ** 2)


def _random_orthogonal(key, dim):
    a = jax.random.normal(key, (dim, dim))
    q, r = jnp.linalg.qr(a)
    return q * jnp.sign(jnp.diagonal(r))


def generalized_contrastive_loss(
    hidden1,
    hidden2,
    key: Optional[jax.Array] = None,
    lambda_weight: float = 1.0,
    temperature: float = 1.0,
    dist: str = "normal",
    hidden_norm: bool = True,
    loss_scaling: float = 1.0,
):
    """loss = scaling * (align + lambda * dist_match); see module docstring."""
    hidden1 = hidden1.astype(jnp.float32)
    hidden2 = hidden2.astype(jnp.float32)
    hidden_dim = hidden1.shape[-1]
    if hidden_norm:
        hidden1 = _l2_normalize(hidden1)
        hidden2 = _l2_normalize(hidden2)
    loss_align = jnp.mean((hidden1 - hidden2) ** 2) / 2.0
    hiddens = jnp.concatenate([hidden1, hidden2], axis=0)
    if dist == "logsumexp":
        loss_dist_match = get_logsumexp_loss(hiddens, temperature)
    else:
        assert key is not None, "SWD losses need a PRNG key"
        k_w, k_prior = jax.random.split(key)
        rand_w = _random_orthogonal(k_w, hidden_dim)
        loss_dist_match = get_swd_loss(hiddens, rand_w, k_prior,
                                       prior=dist, hidden_norm=hidden_norm)
    return loss_scaling * (loss_align + lambda_weight * loss_dist_match)
