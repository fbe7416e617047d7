"""Training batch norm with a hand-written VJP: one reduction pass each way.

Why this exists (measured on TPU v5e, R50 pretrain step, batch 128/chip):
XLA compiles flax ``nn.BatchNorm`` + autodiff into FOUR separate reduction
fusions per layer — forward mean and mean-of-squares as two passes over the
activation, and the backward's d-mean / d-variance chains as two more passes
over (dy, x).  At ResNet block_group1 resolution those passes dominate: the
profiler attributes ~74 ms of a 123 ms train step to `convert_reduce` /
`multiply_reduce` fusions while all convolutions together take ~33 ms.

This module computes the canonical batch-norm gradient instead:

    dbeta  = sum(dy)            dgamma = sum(dy * xhat)
    dx     = gamma * rstd * (dy - sum(dy)/N - xhat * sum(dy*xhat)/N)

so the forward emits ONE fused pass (sum + sum-of-squares are sibling-fused
by XLA when written side by side) and the backward ONE fused pass over
(dy, x), plus the unavoidable elementwise normalize / dx computations which
fuse into neighbours.  Numerics match flax ``nn.BatchNorm`` exactly-enough:
float32 statistics (flax ``force_float32_reductions``), fast variance
``E[x^2] - E[x]^2`` clipped at zero (flax ``use_fast_variance``), float32
normalize cast back to the compute dtype.

Cross-replica behaviour matches the reference's global BN
(/root/reference/resnet.py:37-85):
  * under GSPMD jit with a batch-sharded input, the partitioner turns the
    reductions into cross-replica psums automatically (x.shape is global);
  * under shard_map/pmap, pass ``axis_name`` — local sums are psum'd and N
    scales by the axis size, reproducing lax.pmean-of-stats semantics.

``FusedBatchNorm`` is a drop-in for ``nn.BatchNorm`` with the same
parameter / variable names ("scale", "bias"; batch_stats "mean", "var"), so
checkpoints and the TF import shim (checkpoint_compat.py) are unaffected.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


_ENABLED = True


def set_enabled(value: bool) -> None:
    """Process-wide default for whether BatchNormRelu uses the fused path.

    Trace-time Python state (consulted while modules are constructed/traced,
    never inside compiled code).  The escape hatch is --fused_bn=false."""
    global _ENABLED
    _ENABLED = bool(value)


def is_enabled() -> bool:
    return _ENABLED


def _psum_pair(a, b, axis_name):
    # One collective for both statistics (flax stacks for the same reason).
    stacked = jax.lax.psum(jnp.stack([a, b]), axis_name)
    return stacked[0], stacked[1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def bn_train(x, scale, bias, eps: float, axis_name: Optional[str],
             stat_groups: int = 1, stat_views: int = 1):
    """Batch-normalize ``x`` over all axes but the last, training mode.

    Returns ``(y, mean, var)`` — mean/var are the float32 batch statistics
    for the running-average update.  Gradients flow through ``y`` only (the
    mean/var outputs feed non-differentiated state buffers; their cotangents
    are ignored in the backward pass).

    ``stat_groups > 1`` is ghost batch norm for the GSPMD path (reference
    ``--global_bn=False``, resnet.py:73-85 local-statistics semantics): rows
    are laid out views-major (view0 rows then view1 rows, training/steps.py),
    and replica ``g`` of ``stat_groups`` data shards owns chunk ``g`` of each
    view half.  Statistics are computed per (chunk-of-view0 ∪ chunk-of-view1)
    group — exactly the rows a reference replica would see locally — via
    per-chunk partial sums combined across the tiny (views, groups, C) stats
    array, so no activation data crosses shards; the returned mean/var are
    the group average (the shard_map path's pmean-merge of moving averages).
    """
    y, mean, var, _ = _bn_train_fwd_impl(x, scale, bias, eps, axis_name,
                                         stat_groups, stat_views)
    return y, mean, var


def _group_reshape(xf, stat_groups: int, stat_views: int):
    n_rows = xf.shape[0]
    if n_rows % (stat_views * stat_groups):
        raise ValueError(
            f"ghost BN: {n_rows} rows not divisible by stat_views="
            f"{stat_views} x stat_groups={stat_groups} (per-shard batch must "
            "divide the data-shard count)")
    chunk = n_rows // (stat_views * stat_groups)
    xg = xf.reshape(stat_views, stat_groups, chunk, *xf.shape[1:])
    red_axes = (0,) + tuple(range(2, xg.ndim - 1))  # all but group + channel
    bshape = (1, stat_groups) + (1,) * (xg.ndim - 3) + (xf.shape[-1],)
    n = (n_rows // stat_groups) * math.prod(xf.shape[1:-1])
    return xg, red_axes, bshape, n


def _bn_train_fwd_impl(x, scale, bias, eps, axis_name, stat_groups, stat_views):
    if stat_groups > 1:
        assert axis_name is None, "stat_groups is a GSPMD-path feature"
        xg, red_axes, bshape, n = _group_reshape(
            x.astype(jnp.float32), stat_groups, stat_views)
        s = jnp.sum(xg, axis=red_axes)        # (groups, C)
        q = jnp.sum(xg * xg, axis=red_axes)
        mean = s / n
        var = jnp.maximum(q / n - mean * mean, 0.0)
        rstd = jax.lax.rsqrt(var + eps)
        y = ((xg - mean.reshape(bshape)) * (rstd.reshape(bshape) * scale)
             + bias).astype(x.dtype).reshape(x.shape)
        return y, jnp.mean(mean, 0), jnp.mean(var, 0), (mean, rstd)
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    # math.prod keeps symbolic dims symbolic (jax2tf shape polymorphism);
    # for concrete shapes it's a plain int and the division promotes to f32.
    n = math.prod(x.shape[:-1])
    # Written side by side so XLA sibling-fuses both sums into one pass.
    s = jnp.sum(xf, axis=axes)
    q = jnp.sum(xf * xf, axis=axes)
    if axis_name is not None:
        s, q = _psum_pair(s, q, axis_name)
        n = n * jax.lax.axis_size(axis_name)
    mean = s / n
    var = jnp.maximum(q / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = ((xf - mean) * (rstd * scale) + bias).astype(x.dtype)
    return y, mean, var, (mean, rstd)


def _bn_train_vjp_fwd(x, scale, bias, eps, axis_name, stat_groups, stat_views):
    y, mean, var, (res_mean, rstd) = _bn_train_fwd_impl(
        x, scale, bias, eps, axis_name, stat_groups, stat_views)
    return (y, mean, var), (x, res_mean, rstd, scale)


def _bn_train_vjp_bwd(eps, axis_name, stat_groups, stat_views, res, cotangents):
    dy, _, _ = cotangents  # mean/var feed non-diff running-stat buffers
    x, mean, rstd, scale = res
    if stat_groups > 1:
        xg, red_axes, bshape, n = _group_reshape(
            x.astype(jnp.float32), stat_groups, stat_views)
        dyg = dy.astype(jnp.float32).reshape(xg.shape)
        mean_b, rstd_b = mean.reshape(bshape), rstd.reshape(bshape)
        xhat = (xg - mean_b) * rstd_b
        sd = jnp.sum(dyg, axis=red_axes)        # (groups, C)
        sx = jnp.sum(dyg * xhat, axis=red_axes)
        dbeta = jnp.sum(sd, 0)
        dgamma = jnp.sum(sx, 0)
        dx = ((rstd_b * scale) * (dyg - sd.reshape(bshape) / n
                                  - xhat * (sx.reshape(bshape) / n)))
        dx = dx.astype(x.dtype).reshape(x.shape)
        return dx, dgamma.astype(scale.dtype), dbeta.astype(scale.dtype)
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    n = math.prod(x.shape[:-1])
    xhat = (xf - mean) * rstd
    # One fused pass over (dy, x).
    sd = jnp.sum(dyf, axis=axes)
    sx = jnp.sum(dyf * xhat, axis=axes)
    if axis_name is not None:
        sd, sx = _psum_pair(sd, sx, axis_name)
        n = n * jax.lax.axis_size(axis_name)
    dbeta = sd
    dgamma = sx
    dx = ((rstd * scale) * (dyf - sd / n - xhat * (sx / n))).astype(x.dtype)
    return dx, dgamma.astype(scale.dtype), dbeta.astype(scale.dtype)


bn_train.defvjp(_bn_train_vjp_fwd, _bn_train_vjp_bwd)


class FusedBatchNorm(nn.Module):
    """Drop-in ``nn.BatchNorm`` (feature axis -1) with the fused train path.

    Eval mode (``use_running_average=True``) is plain elementwise math on the
    stored statistics — no custom anything, XLA fuses it away.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_bias: bool = True
    use_scale: bool = True
    scale_init: Any = nn.initializers.ones
    axis_name: Optional[str] = None
    # Ghost batch norm (GSPMD --global_bn=False): statistics per group of
    # rows, views-major layout — see bn_train.  1 = plain global statistics.
    stat_groups: int = 1
    stat_views: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        if self.use_scale:
            scale = self.param("scale", self.scale_init, (features,), self.param_dtype)
        else:
            scale = jnp.ones((features,), self.param_dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (features,), self.param_dtype)
        else:
            bias = jnp.zeros((features,), self.param_dtype)

        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))

        if self.use_running_average:
            rstd = jax.lax.rsqrt(ra_var.value + self.epsilon)
            y = ((x.astype(jnp.float32) - ra_mean.value) * (rstd * scale) + bias)
            return y.astype(self.dtype)

        # Init traces use a tiny sample batch whose row count need not divide
        # the group layout; statistics there are throwaway.
        groups = 1 if self.is_initializing() else self.stat_groups
        y, mean, var = bn_train(x, scale.astype(jnp.float32),
                                bias.astype(jnp.float32),
                                self.epsilon, self.axis_name,
                                groups, self.stat_views)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return y.astype(self.dtype)
