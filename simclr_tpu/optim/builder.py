"""Optimizer selection + weight-decay policy + finetune trainable masks.

Reference: tf2/model.py:29-69 (build_optimizer / add_weight_decay) and the
block-freezing collections of model.py:96-103 / tf2/resnet.py:548-692.
"""

from __future__ import annotations

import re
from typing import Callable, Union

import jax
import jax.numpy as jnp
import optax

from simclr_tpu.config import Config
from simclr_tpu.optim.lars import DEFAULT_EXCLUDE, lars, param_path_strings


def build_optimizer(config: Config, learning_rate: Union[float, Callable]) -> optax.GradientTransformation:
    """momentum | adam | lars (tf2/model.py:29-44)."""
    if config.optimizer == "momentum":
        return optax.sgd(learning_rate, momentum=config.momentum, nesterov=True)
    elif config.optimizer == "adam":
        return optax.adam(learning_rate)
    elif config.optimizer == "lars":
        return lars(
            learning_rate,
            momentum=config.momentum,
            weight_decay=config.weight_decay,
            exclude_from_weight_decay=list(DEFAULT_EXCLUDE),
        )
    raise ValueError(f"Unknown optimizer {config.optimizer}")


def add_weight_decay(config: Config, params) -> jnp.ndarray:
    """L2 loss term per the reference policy (tf2/model.py:47-69).

    LARS handles decay internally except the supervised head (non-bias),
    which is L2-regularized through the loss; other optimizers decay all
    non-BN params through the loss.
    """
    names = param_path_strings(params)
    leaves = jax.tree_util.tree_leaves(params)
    if "lars" in config.optimizer:
        selected = [
            v for n, v in zip(names, leaves)
            if "head_supervised" in n and "bias" not in n
        ]
    else:
        selected = [v for n, v in zip(names, leaves) if "batch_norm" not in n]
    if not selected:
        return jnp.zeros([], jnp.float32)
    # tf.nn.l2_loss(v) == sum(v**2)/2
    return config.weight_decay * sum(0.5 * jnp.sum(jnp.square(v.astype(jnp.float32))) for v in selected)


def _block_index(name: str) -> int:
    """Map a param path to its freeze stage: 0 = stem, 1..4 = block groups,
    5 = heads (the TF1 trainable_variables_inblock_{0..5} convention,
    reference resnet.py:599-677)."""
    m = re.search(r"block_group(\d)", name)
    if m:
        return int(m.group(1))
    if name.startswith("resnet/") or name.startswith("resnet"):
        return 0  # stem
    return 5  # projection / supervised heads


def trainable_mask(config: Config, params):
    """Bool pytree — True where the optimizer may update the param.

    Pretrain / fine_tune_after_block == -1: everything trainable.
    Finetune with fine_tune_after_block == k: stem and groups 1..k frozen
    (group g trainable iff g > k; stem trainable iff k == -1); heads always
    trainable (model.py:96-103 semantics).
    """
    names = param_path_strings(params)
    treedef = jax.tree_util.tree_structure(params)
    if config.train_mode != "finetune" or config.fine_tune_after_block == -1:
        vals = [True] * len(names)
    else:
        k = config.fine_tune_after_block
        vals = []
        for n in names:
            b = _block_index(n)
            if b == 5:
                vals.append(True)
            elif b == 0:
                vals.append(False)  # stem frozen whenever k >= 0
            else:
                vals.append(b > k)
    return jax.tree_util.tree_unflatten(treedef, vals)


def masked(tx: optax.GradientTransformation, mask) -> optax.GradientTransformation:
    """Zero updates for frozen params (keeps state shapes stable)."""
    def init_fn(params):
        return tx.init(params)

    def update_fn(grads, state, params=None):
        updates, state = tx.update(grads, state, params)
        updates = jax.tree.map(lambda u, m: u if m else jnp.zeros_like(u), updates, mask)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)
