"""NT-Xent tests: reference-formula oracle, single==multi-device
equivalence over a virtual 8-device mesh (SURVEY.md §4 plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simclr_tpu.objectives.ntxent import (
    add_contrastive_loss,
    add_supervised_loss,
    contrastive_accuracy,
    contrastive_entropy,
)


def _numpy_ntxent(hidden, temperature, hidden_norm=True):
    """Independent NumPy oracle of objective.py:34-88 math."""
    hidden = np.asarray(hidden, np.float64)
    if hidden_norm:
        hidden = hidden / np.linalg.norm(hidden, axis=-1, keepdims=True)
    h1, h2 = np.split(hidden, 2, axis=0)
    b = h1.shape[0]
    labels = np.eye(2 * b)[np.arange(b)]
    masks = np.eye(b)
    laa = h1 @ h1.T / temperature - masks * 1e9
    lbb = h2 @ h2.T / temperature - masks * 1e9
    lab = h1 @ h2.T / temperature
    lba = h2 @ h1.T / temperature

    def xent(logits):
        logits = logits - logits.max(axis=1, keepdims=True)
        logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
        return -(labels * logp).sum(axis=1)

    loss_a = xent(np.concatenate([lab, laa], 1))
    loss_b = xent(np.concatenate([lba, lbb], 1))
    return np.mean(loss_a + loss_b)


def test_matches_numpy_oracle():
    hidden = jax.random.normal(jax.random.PRNGKey(0), (16, 32))
    loss, logits_ab, labels = add_contrastive_loss(hidden, temperature=0.5)
    expected = _numpy_ntxent(hidden, 0.5)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    assert logits_ab.shape == (8, 8)
    assert labels.shape == (8, 16)


def test_no_hidden_norm():
    hidden = jax.random.normal(jax.random.PRNGKey(1), (8, 16)) * 0.1
    loss, _, _ = add_contrastive_loss(hidden, hidden_norm=False, temperature=1.0)
    expected = _numpy_ntxent(hidden, 1.0, hidden_norm=False)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_perfect_alignment_low_loss():
    """Identical views => positives dominate => loss below random level."""
    h = jax.random.normal(jax.random.PRNGKey(2), (8, 64))
    hidden = jnp.concatenate([h, h], axis=0)
    loss_aligned, logits_ab, labels = add_contrastive_loss(hidden, temperature=0.1)
    rand = jax.random.normal(jax.random.PRNGKey(3), (16, 64))
    loss_rand, _, _ = add_contrastive_loss(rand, temperature=0.1)
    assert float(loss_aligned) < float(loss_rand)
    assert float(contrastive_accuracy(logits_ab, labels)) == 1.0


def test_shard_map_equals_single_device():
    """Global-batch NT-Xent under shard_map over 8 devices must equal the
    single-device loss on the same global batch (objective.py:102-103
    equivalence, which the reference could never test)."""
    devices = jax.devices()
    assert len(devices) == 8, "conftest should force 8 virtual devices"
    mesh = Mesh(np.array(devices), ("data",))
    global_b = 32  # per view
    hidden = jax.random.normal(jax.random.PRNGKey(4), (2 * global_b, 24))

    loss_ref, _, _ = add_contrastive_loss(hidden, temperature=0.2)

    h1, h2 = jnp.split(hidden, 2, axis=0)

    def local_step(h1_local, h2_local):
        local = jnp.concatenate([h1_local, h2_local], axis=0)
        loss, _, _ = add_contrastive_loss(local, temperature=0.2, axis_name="data")
        return jax.lax.pmean(loss, "data")

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data"), P("data")), out_specs=P(),
    )
    loss_sharded = sharded(h1, h2)
    np.testing.assert_allclose(float(loss_sharded), float(loss_ref), rtol=1e-5)


def test_gspmd_sharded_equals_replicated():
    """The GSPMD path: jit with batch-sharded input gives the same loss."""
    devices = jax.devices()
    mesh = Mesh(np.array(devices), ("data",))
    hidden = jax.random.normal(jax.random.PRNGKey(5), (64, 24))

    def f(h):
        loss, _, _ = add_contrastive_loss(h, temperature=0.2)
        return loss

    loss_ref = f(hidden)
    sharding = NamedSharding(mesh, P("data"))
    hidden_sharded = jax.device_put(hidden, sharding)
    loss_sharded = jax.jit(f)(hidden_sharded)
    np.testing.assert_allclose(float(loss_sharded), float(loss_ref), rtol=1e-5)


def test_supervised_loss():
    labels = jax.nn.one_hot(jnp.array([0, 1, 2]), 3)
    logits = jnp.array([[10.0, 0, 0], [0, 10.0, 0], [0, 0, 10.0]])
    assert float(add_supervised_loss(labels, logits)) < 0.01


def test_entropy_positive():
    logits = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
    assert float(contrastive_entropy(logits)) > 0
