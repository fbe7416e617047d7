"""LARS optimizer as an optax GradientTransformation.

Re-design of reference lars_optimizer.py:83-161 / tf2/lars_optimizer.py:83-137
(You, Gitman, Ginsburg — arXiv:1708.03888): per-parameter trust ratio
``eeta * ||w|| / ||g + wd*w||`` gating the learning rate, momentum slot per
parameter, decoupled weight decay folded into the gradient before the trust
ratio, and regex name-screening for both weight decay and layer adaptation.

Name-based screening operates on '/'-joined flax param paths (e.g.
``resnet/block_group1/block_0/bn_0/batch_norm/scale``); the default
exclusions reproduce the reference's
``['batch_normalization', 'bias', 'head_supervised']`` (tf2/model.py:40-42)
against this framework's naming ('batch_norm' modules, 'bias'/'scale'
leaves — BN scale is excluded via its module path).

The whole update is elementwise + two reductions per parameter: XLA fuses it
into the gradient epilogue, and every operation is pytree-structural so it
shards transparently under pjit/FSDP.
"""

from __future__ import annotations

import re
from typing import Callable, NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import optax

EETA_DEFAULT = 0.001

# Default exclusions (tf2/model.py:40-42).  'batch_norm' covers this
# framework's BN module naming; 'batch_normalization' kept for imported
# TF-checkpoint naming contexts.
DEFAULT_EXCLUDE = ("batch_norm", "bias", "head_supervised")


def param_path_strings(params) -> list:
    """Flatten a pytree into '/'-joined path strings (stable order)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, _ in flat:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        out.append("/".join(parts))
    return out


def _name_mask(params, patterns: Optional[Sequence[str]], exclude: bool):
    """Bool pytree: True where NO pattern matches (i.e. not excluded)."""
    names = param_path_strings(params)
    treedef = jax.tree_util.tree_structure(params)
    if not patterns:
        vals = [True] * len(names)
    else:
        vals = [not any(re.search(r, n) for r in patterns) for n in names]
    return jax.tree_util.tree_unflatten(treedef, vals)


class LarsState(NamedTuple):
    momentum: optax.Updates


def lars(
    learning_rate: Union[float, Callable],
    momentum: float = 0.9,
    use_nesterov: bool = False,
    weight_decay: float = 0.0,
    exclude_from_weight_decay: Optional[Sequence[str]] = DEFAULT_EXCLUDE,
    exclude_from_layer_adaptation: Optional[Sequence[str]] = None,
    classic_momentum: bool = True,
    eeta: float = EETA_DEFAULT,
) -> optax.GradientTransformation:
    """Build the LARS transform.  ``update`` requires ``params``."""
    if exclude_from_layer_adaptation is None:
        exclude_from_layer_adaptation = exclude_from_weight_decay

    def lr_at(count):
        return learning_rate(count) if callable(learning_rate) else learning_rate

    def init_fn(params):
        return (
            LarsState(momentum=jax.tree.map(jnp.zeros_like, params)),
            optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32)),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("lars requires params")
        lars_state, sched_state = state
        lr = jnp.asarray(lr_at(sched_state.count), jnp.float32)
        wd_mask = _name_mask(params, exclude_from_weight_decay, True)
        adapt_mask = _name_mask(params, exclude_from_layer_adaptation, True)

        def one(g, p, v, use_wd, do_adapt):
            g = g.astype(jnp.float32)
            p = p.astype(jnp.float32)
            if weight_decay and use_wd:
                g = g + weight_decay * p

            def trust_ratio_of(x):
                w_norm = jnp.linalg.norm(p)
                x_norm = jnp.linalg.norm(x)
                return jnp.where(
                    w_norm > 0, jnp.where(x_norm > 0, eeta * w_norm / x_norm, 1.0), 1.0
                )

            if classic_momentum:
                trust = trust_ratio_of(g) if do_adapt else 1.0
                scaled_lr = lr * trust
                next_v = momentum * v + scaled_lr * g
                upd = momentum * next_v + scaled_lr * g if use_nesterov else next_v
                return -upd, next_v
            else:
                next_v = momentum * v + g
                upd = momentum * next_v + g if use_nesterov else next_v
                trust = trust_ratio_of(upd) if do_adapt else 1.0
                return -(lr * trust) * upd, next_v

        flat_out = jax.tree.map(
            one, grads, params, lars_state.momentum, wd_mask, adapt_mask,
            is_leaf=lambda x: isinstance(x, jnp.ndarray) or hasattr(x, "shape"),
        )
        updates = jax.tree.map(lambda t: t[0], flat_out, is_leaf=lambda x: isinstance(x, tuple))
        new_v = jax.tree.map(lambda t: t[1], flat_out, is_leaf=lambda x: isinstance(x, tuple))
        return updates, (
            LarsState(momentum=new_v),
            optax.ScaleByScheduleState(count=sched_state.count + 1),
        )

    return optax.GradientTransformation(init_fn, update_fn)
