"""NT-Xent contrastive objective + supervised loss.

Re-design of reference objective.py:29-124 / tf2/objective.py:27-127 for
SPMD TPU execution.  The reference emulates an all-gather by scatter_nd +
cross_replica_sum (tf2/objective.py:92-127); here there are two native
paths:

  * **GSPMD path** (``axis_name=None``): ``hidden`` is the *global* logical
    batch (2N, D), possibly sharded over the mesh 'data' axis by pjit.  The
    similarity matmuls are written over the global array and the XLA
    partitioner materializes exactly the (local x global) tile structure —
    each chip computes its row-block against an all-gathered RHS riding ICI.
  * **shard_map/pmap path** (``axis_name='data'``): explicit
    ``lax.all_gather`` of the L2-normalized local embeddings and
    replica-offset labels, bit-matching the reference tile layout
    (objective.py:64-68).

Both paths produce identical losses (tested single-vs-multi-device).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

LARGE_NUM = 1e9


def add_supervised_loss(labels, logits) -> jnp.ndarray:
    """Mean softmax cross-entropy (tf2/objective.py:27-32)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(labels * logp, axis=-1))


def add_contrastive_loss(
    hidden: jnp.ndarray,
    hidden_norm: bool = True,
    temperature: float = 1.0,
    axis_name: Optional[str] = None,
    weights: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NT-Xent loss (tf2/objective.py:35-89).

    Args:
      hidden: (2B, D) embeddings; the two views stacked on the batch axis
        (first B rows = view a, last B rows = view b).
      hidden_norm: L2-normalize rows first.
      temperature: softmax temperature.
      axis_name: if set, embeddings are per-device shards inside
        shard_map/pmap and negatives are all-gathered over this mesh axis;
        if None, ``hidden`` is already the global batch (GSPMD path).
      weights: optional (B,) validity mask over image pairs (TF1 eval
        padding, data.py:31-100).  Padded pairs are excluded from the mean
        AND masked out of every row's negatives, so a padded final eval
        batch reports the same loss as an unpadded one.

    Returns:
      (scalar loss, logits_ab, one-hot labels) — logits/labels feed the
      contrastive accuracy/entropy metrics like the reference.
    """
    hidden = hidden.astype(jnp.float32)
    if hidden_norm:
        hidden = hidden / jnp.linalg.norm(hidden, axis=-1, keepdims=True).clip(1e-12)
    hidden1, hidden2 = jnp.split(hidden, 2, axis=0)
    batch_size = hidden1.shape[0]

    if axis_name is not None:
        hidden1_large = jax.lax.all_gather(hidden1, axis_name, axis=0, tiled=True)
        hidden2_large = jax.lax.all_gather(hidden2, axis_name, axis=0, tiled=True)
        enlarged_batch_size = hidden1_large.shape[0]
        replica_id = jax.lax.axis_index(axis_name)
        labels_idx = jnp.arange(batch_size) + replica_id * batch_size
    else:
        hidden1_large = hidden1
        hidden2_large = hidden2
        enlarged_batch_size = batch_size
        labels_idx = jnp.arange(batch_size)

    labels = jax.nn.one_hot(labels_idx, enlarged_batch_size * 2)
    masks = jax.nn.one_hot(labels_idx, enlarged_batch_size)

    def sim(a, b):
        return jnp.dot(a, b.T, preferred_element_type=jnp.float32) / temperature

    logits_aa = sim(hidden1, hidden1_large) - masks * LARGE_NUM
    logits_bb = sim(hidden2, hidden2_large) - masks * LARGE_NUM
    logits_ab = sim(hidden1, hidden2_large)
    logits_ba = sim(hidden2, hidden1_large)

    if weights is not None:
        w = weights.astype(jnp.float32)
        if axis_name is not None:
            w_large = jax.lax.all_gather(w, axis_name, axis=0, tiled=True)
        else:
            w_large = w
        # Remove padded pairs from everyone's candidate set.  A valid row's
        # positive column is its own (valid) pair, so positives survive.
        col_mask = (1.0 - w_large) * LARGE_NUM
        logits_aa = logits_aa - col_mask[None, :]
        logits_bb = logits_bb - col_mask[None, :]
        logits_ab = logits_ab - col_mask[None, :]
        logits_ba = logits_ba - col_mask[None, :]

    def xent(logits):
        return -jnp.sum(labels * jax.nn.log_softmax(logits, axis=-1), axis=-1)

    loss_a = xent(jnp.concatenate([logits_ab, logits_aa], axis=1))
    loss_b = xent(jnp.concatenate([logits_ba, logits_bb], axis=1))
    if weights is not None:
        w = weights.astype(jnp.float32)
        loss = jnp.sum((loss_a + loss_b) * w) / jnp.clip(jnp.sum(w), 1.0)
    else:
        loss = jnp.mean(loss_a + loss_b)
    return loss, logits_ab, labels


def contrastive_accuracy(logits_ab, labels) -> jnp.ndarray:
    """Top-1 agreement between positive-pair prediction and labels."""
    return jnp.mean(
        (jnp.argmax(logits_ab, axis=1) == jnp.argmax(labels[:, : logits_ab.shape[1]], axis=1))
        .astype(jnp.float32)
    )


def contrastive_entropy(logits_ab) -> jnp.ndarray:
    """Mean entropy of the positive-pair softmax (a collapse diagnostic,
    reference tf2/run.py:545-549)."""
    prob = jax.nn.softmax(logits_ab, axis=-1)
    return -jnp.mean(jnp.sum(prob * jnp.log(prob + 1e-8), axis=-1))
