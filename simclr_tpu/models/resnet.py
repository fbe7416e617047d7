"""TPU-native ResNet v1 encoder family (SimCLR v1/v2 capable).

Functional flax.linen re-design of the reference encoder
(/root/reference/resnet.py:684-706, /root/reference/tf2/resnet.py:529-747):
depths {18,34,50,101,152,200}, width multipliers, CIFAR stem, selective
kernels (SK) with the ResNet-D stem/shortcut, squeeze-excite, DropBlock,
zero-init of each block's final BN gamma, named endpoints, and
``fine_tune_after_block`` stop-gradient freezing.

TPU-first choices (not in the reference):
  * NHWC layout with bfloat16 activations / float32 params & BN stats —
    convs land on the MXU as bf16, statistics stay exact.
  * Batch norm is a plain batch-axis reduction over the *global* logical
    batch: under ``jit`` with a batch-sharded input, XLA inserts the
    cross-replica ``psum`` over ICI automatically, which reproduces the
    reference's cross-replica BN (reference resnet.py:37-85) without any
    hand-written collective.  An explicit ``axis_name`` is also supported
    for shard_map/pmap contexts.
  * Everything is shape-static and trace-once: block freezing is a
    compile-time Python conditional, not graph surgery.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from simclr_tpu.ops import fused_bn

BATCH_NORM_EPSILON = 1e-5

# Block-depth table (reference tf2/resnet.py:708-738).
MODEL_PARAMS = {
    18: ("residual", (2, 2, 2, 2)),
    34: ("residual", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
    200: ("bottleneck", (3, 24, 36, 3)),
}

conv_kernel_init = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")


class BatchNormRelu(nn.Module):
    """BN (+ optional ReLU), reference tf2/resnet.py:31-78 semantics.

    ``center`` doubles as the LinearLayer ``use_bias`` flag (tf2/model.py:135).
    Under GSPMD the batch statistics are global automatically; ``axis_name``
    enables the same inside shard_map/pmap.
    """

    relu: bool = True
    init_zero: bool = False
    center: bool = True
    scale: bool = True
    momentum: float = 0.9
    axis_name: Optional[str] = None
    # True/False selects the fused-VJP vs flax BN implementation; None
    # defers to the process default (ops/fused_bn.is_enabled()).  Threaded
    # down from SimCLRModel.from_config so each model instance carries its
    # own choice instead of flipping global state (ADVICE r2).
    use_fused: Optional[bool] = None
    # Ghost batch norm for --global_bn=False under GSPMD: per-data-shard
    # statistics without shard_map (reference resnet.py:73-85 local-stats
    # semantics).  Rows are views-major; group g = shard-g chunk of every
    # view half.  Only the fused implementation supports it (numerically
    # interchangeable with flax BN, tested), so stat_groups > 1 forces it.
    stat_groups: int = 1
    stat_views: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        scale_init = nn.initializers.zeros if self.init_zero else nn.initializers.ones
        use_fused = (self.use_fused if self.use_fused is not None
                     else fused_bn.is_enabled())
        if self.stat_groups > 1:
            use_fused = True
        if use_fused:
            # Fused-VJP batch norm: one reduction pass forward, one backward
            # (see ops/fused_bn.py — ~40% of the R50 step was BN reductions
            # under the flax/autodiff formulation). Identical param/variable
            # naming, so checkpoints are interchangeable.
            x = fused_bn.FusedBatchNorm(
                use_running_average=not train,
                momentum=self.momentum,
                epsilon=BATCH_NORM_EPSILON,
                use_bias=self.center,
                use_scale=self.scale,
                scale_init=scale_init,
                axis_name=self.axis_name,
                stat_groups=self.stat_groups,
                stat_views=self.stat_views,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="batch_norm",
            )(x)
        else:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.momentum,
                epsilon=BATCH_NORM_EPSILON,
                use_bias=self.center,
                use_scale=self.scale,
                scale_init=scale_init,
                axis_name=self.axis_name,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="batch_norm",
            )(x)
        if self.relu:
            x = nn.relu(x)
        return x


# Space-to-depth stem (module-level switch for A/B benchmarks).  The 7x7
# stride-2 stem conv reads a 3-channel input — 3 of 128 MXU lanes busy.  The
# classic TPU fix (MLPerf ResNet): pack 2x2 pixel cells into channels
# ((B,230,230,3) -> (B,115,115,12)) and run the EXACT same convolution as a
# 4x4 stride-1 conv whose kernel is the zero-padded 8x8 rearrangement of the
# 7x7 weights.  Bit-for-bit the same sums; the stored parameter stays
# (7, 7, 3, 64) so checkpoints are unaffected.
STEM_SPACE_TO_DEPTH = True


class _ConvKernel(nn.Module):
    """Bare conv kernel parameter holder (so the param path matches
    nn.Conv's `<name>/kernel`)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_kernel_init, self.shape, jnp.float32)


class _StemConvS2D(nn.Module):
    """ImageNet stem conv via space-to-depth; replaces
    Conv2dFixedPadding(64w, 7, 2).  Param tree identical ("conv2d/kernel",
    shape (7,7,3,64w))."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w7 = _ConvKernel((7, 7, c, self.filters), name="conv2d")()
        x = fixed_padding(x, 7)  # (B, H+6, W+6, C); H+6 even for even H
        b, h, w, _ = x.shape
        x = (
            x.reshape(b, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h // 2, w // 2, 4 * c)
        )
        w8 = jnp.pad(w7, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (8, 8, C, F)
        wk = (
            w8.reshape(4, 2, 4, 2, c, self.filters)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * c, self.filters)
        )
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), wk.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def fixed_padding(x, kernel_size: int):
    """Explicit SAME-style padding used before stride-2 convs.

    Matches reference tf2/resnet.py:160-181: total pad = k-1, split
    floor/ceil, so a stride-2 conv takes the top-left-aligned grid that TF's
    pad+VALID produces (plain SAME would differ for even extents).
    """
    pad_total = kernel_size - 1
    pad_beg = pad_total // 2
    pad_end = pad_total - pad_beg
    return jnp.pad(x, ((0, 0), (pad_beg, pad_end), (pad_beg, pad_end), (0, 0)))


# 1x1 convolutions as explicit dot_generals (module-level switch so A/B
# benchmarks can flip it; semantics identical — a pointwise conv IS a
# matmul over the channel dim, and for stride 2 TF's pad+VALID grid is the
# ::2 subsample).  Routing them through dot_general hands XLA a clean
# (M, K) x (K, N) contraction for forward, dX and dW instead of the conv
# lowering.
ONE_BY_ONE_DOT = True


class _OneByOneConv(nn.Module):
    """Pointwise conv as a matmul; param tree identical to nn.Conv
    (kernel (1, 1, C, F)) so checkpoints are interchangeable."""

    features: int
    strides: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", conv_kernel_init, (1, 1, x.shape[-1], self.features), jnp.float32
        )
        if self.strides > 1:
            x = x[:, :: self.strides, :: self.strides, :]
        b, h, w, c = x.shape
        y = jax.lax.dot_general(
            x.reshape(b * h * w, c),
            kernel[0, 0].astype(self.dtype),
            (((1,), (0,)), ((), ())),
        )
        return y.reshape(b, h, w, self.features)


class Conv2dFixedPadding(nn.Module):
    """Conv with reference padding semantics (tf2/resnet.py:184-211)."""

    filters: int
    kernel_size: int
    strides: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.kernel_size == 1 and ONE_BY_ONE_DOT:
            return _OneByOneConv(self.filters, self.strides, dtype=self.dtype,
                                 name="conv2d")(x)
        if self.strides > 1:
            x = fixed_padding(x, self.kernel_size)
        return nn.Conv(
            features=self.filters,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME" if self.strides == 1 else "VALID",
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv2d",
        )(x)


class SKConv2D(nn.Module):
    """Selective-kernel conv (tf2/resnet.py:214-277).

    Two 3x3 streams realised as one 2F-channel conv + split; mixing weights
    from a squeezed global descriptor through a 1x1 bottleneck, softmax over
    the two streams.  All matmul-shaped — MXU friendly.
    """

    filters: int
    strides: int
    sk_ratio: float
    min_dim: int = 32
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    fused_bn: Optional[bool] = None
    stat_groups: int = 1
    stat_views: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = functools.partial(
            BatchNormRelu, momentum=self.bn_momentum, axis_name=self.axis_name,
            use_fused=self.fused_bn, stat_groups=self.stat_groups,
            stat_views=self.stat_views, dtype=self.dtype
        )
        x = Conv2dFixedPadding(2 * self.filters, 3, self.strides, dtype=self.dtype, name="conv2d_fixed_padding")(x)
        x = bn(name="batch_norm_relu")(x, train)
        # (B, H, W, 2F) -> (2, B, H, W, F) streams.
        streams = jnp.stack(jnp.split(x, 2, axis=-1))

        mid_dim = max(int(self.filters * self.sk_ratio), self.min_dim)
        global_features = jnp.mean(jnp.sum(streams, axis=0), axis=(1, 2), keepdims=True)
        mixing = nn.Conv(mid_dim, (1, 1), use_bias=False, kernel_init=conv_kernel_init,
                         dtype=self.dtype, param_dtype=jnp.float32, name="conv2d_0")(global_features)
        mixing = bn(name="batch_norm_relu_1")(mixing, train)
        mixing = nn.Conv(2 * self.filters, (1, 1), use_bias=False, kernel_init=conv_kernel_init,
                         dtype=self.dtype, param_dtype=jnp.float32, name="conv2d_1")(mixing)
        mixing = jnp.stack(jnp.split(mixing, 2, axis=-1))
        mixing = jax.nn.softmax(mixing, axis=0)
        return jnp.sum(streams * mixing, axis=0)


class SELayer(nn.Module):
    """Squeeze-and-excite (tf2/resnet.py:280-311)."""

    filters: int
    se_ratio: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(max(1, int(self.filters * self.se_ratio)), (1, 1), use_bias=True,
                     kernel_init=conv_kernel_init, dtype=self.dtype, param_dtype=jnp.float32,
                     name="se_reduce")(se)
        se = nn.Conv(x.shape[-1], (1, 1), use_bias=True, kernel_init=conv_kernel_init,
                     dtype=self.dtype, param_dtype=jnp.float32, name="se_expand")(nn.relu(se))
        return jax.nn.sigmoid(se.astype(jnp.float32)).astype(x.dtype) * x


class DropBlock(nn.Module):
    """Structured spatial dropout (tf2/resnet.py:81-157). No-op unless
    keep_prob is set (the reference flags never enable it, but the op is part
    of the component inventory)."""

    keep_prob: Optional[float]
    dropblock_size: Optional[int]

    @nn.compact
    def __call__(self, x, train: bool):
        if not train or self.keep_prob is None:
            return x
        w = x.shape[1]
        size = min(self.dropblock_size, w)
        seed_drop_rate = (1.0 - self.keep_prob) * w**2 / size**2 / (w - size + 1) ** 2

        w_i = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        h_i = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        valid_center = (
            (w_i >= size // 2) & (w_i < w - (size - 1) // 2)
            & (h_i >= size // 2) & (h_i < w - (size - 1) // 2)
        )[None, :, :, None]

        noise = jax.random.uniform(self.make_rng("dropblock"), x.shape, jnp.float32)
        block_pattern = (
            1.0 - valid_center.astype(jnp.float32) + (1.0 - seed_drop_rate) + noise
        ) >= 1.0
        block_pattern = block_pattern.astype(jnp.float32)
        if size == w:
            block_pattern = jnp.min(block_pattern, axis=(1, 2), keepdims=True)
        else:
            block_pattern = -jax.lax.reduce_window(
                -block_pattern, -jnp.inf, jax.lax.max,
                (1, size, size, 1), (1, 1, 1, 1), "SAME",
            )
        percent_ones = jnp.mean(block_pattern)
        return x / percent_ones.astype(x.dtype) * block_pattern.astype(x.dtype)


class ResidualBlock(nn.Module):
    """Two-3x3 residual block (tf2/resnet.py:315-381)."""

    filters: int
    strides: int
    use_projection: bool = False
    sk_ratio: float = 0.0
    se_ratio: float = 0.0
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    fused_bn: Optional[bool] = None
    stat_groups: int = 1
    stat_views: int = 1
    dropblock_keep_prob: Optional[float] = None
    dropblock_size: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = functools.partial(
            BatchNormRelu, momentum=self.bn_momentum, axis_name=self.axis_name,
            use_fused=self.fused_bn, stat_groups=self.stat_groups,
            stat_views=self.stat_views, dtype=self.dtype
        )
        shortcut = x
        if self.use_projection:
            if self.sk_ratio > 0:  # ResNet-D shortcut: avg-pool then 1x1.
                if self.strides > 1:
                    shortcut = fixed_padding(shortcut, 2)
                shortcut = nn.avg_pool(
                    shortcut, (2, 2), strides=(self.strides, self.strides),
                    padding="SAME" if self.strides == 1 else "VALID",
                )
                shortcut = Conv2dFixedPadding(self.filters, 1, 1, dtype=self.dtype, name="proj_conv")(shortcut)
            else:
                shortcut = Conv2dFixedPadding(self.filters, 1, self.strides, dtype=self.dtype, name="proj_conv")(shortcut)
            shortcut = bn(relu=False, name="proj_bn")(shortcut, train)

        x = Conv2dFixedPadding(self.filters, 3, self.strides, dtype=self.dtype, name="conv_0")(x)
        x = bn(name="bn_0")(x, train)
        x = Conv2dFixedPadding(self.filters, 3, 1, dtype=self.dtype, name="conv_1")(x)
        x = bn(relu=False, init_zero=True, name="bn_1")(x, train)
        if self.se_ratio > 0:
            x = SELayer(self.filters, self.se_ratio, dtype=self.dtype, name="se")(x)
        return nn.relu(x + shortcut)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3(/SK) -> 1x1 bottleneck with 4x expansion
    (tf2/resnet.py:384-488)."""

    filters: int
    strides: int
    use_projection: bool = False
    sk_ratio: float = 0.0
    se_ratio: float = 0.0
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    fused_bn: Optional[bool] = None
    stat_groups: int = 1
    stat_views: int = 1
    dropblock_keep_prob: Optional[float] = None
    dropblock_size: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = functools.partial(
            BatchNormRelu, momentum=self.bn_momentum, axis_name=self.axis_name,
            use_fused=self.fused_bn, stat_groups=self.stat_groups,
            stat_views=self.stat_views, dtype=self.dtype
        )
        dropblock = functools.partial(
            DropBlock, keep_prob=self.dropblock_keep_prob, dropblock_size=self.dropblock_size
        )
        shortcut = x
        if self.use_projection:
            filters_out = 4 * self.filters
            if self.sk_ratio > 0:  # ResNet-D shortcut.
                if self.strides > 1:
                    shortcut = fixed_padding(shortcut, 2)
                shortcut = nn.avg_pool(
                    shortcut, (2, 2), strides=(self.strides, self.strides),
                    padding="SAME" if self.strides == 1 else "VALID",
                )
                shortcut = Conv2dFixedPadding(filters_out, 1, 1, dtype=self.dtype, name="proj_conv")(shortcut)
            else:
                shortcut = Conv2dFixedPadding(filters_out, 1, self.strides, dtype=self.dtype, name="proj_conv")(shortcut)
            shortcut = bn(relu=False, name="proj_bn")(shortcut, train)
        shortcut = dropblock(name="shortcut_dropblock")(shortcut, train)

        x = Conv2dFixedPadding(self.filters, 1, 1, dtype=self.dtype, name="conv_0")(x)
        x = bn(name="bn_0")(x, train)
        x = dropblock(name="dropblock_0")(x, train)

        if self.sk_ratio > 0:
            x = SKConv2D(self.filters, self.strides, self.sk_ratio,
                         bn_momentum=self.bn_momentum, axis_name=self.axis_name,
                         fused_bn=self.fused_bn, stat_groups=self.stat_groups, stat_views=self.stat_views,
                         dtype=self.dtype, name="sk_conv2d")(x, train)
        else:
            x = Conv2dFixedPadding(self.filters, 3, self.strides, dtype=self.dtype, name="conv_1")(x)
            x = bn(name="bn_1")(x, train)
        x = dropblock(name="dropblock_1")(x, train)

        x = Conv2dFixedPadding(4 * self.filters, 1, 1, dtype=self.dtype, name="conv_2")(x)
        x = bn(relu=False, init_zero=True, name="bn_2")(x, train)
        x = dropblock(name="dropblock_2")(x, train)

        if self.se_ratio > 0:
            x = SELayer(self.filters, self.se_ratio, dtype=self.dtype, name="se")(x)
        return nn.relu(x + shortcut)


class BlockGroup(nn.Module):
    """A stage of blocks; first block projects/strides (tf2/resnet.py:491-525)."""

    filters: int
    block_type: str
    blocks: int
    strides: int
    sk_ratio: float = 0.0
    se_ratio: float = 0.0
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    fused_bn: Optional[bool] = None
    stat_groups: int = 1
    stat_views: int = 1
    dropblock_keep_prob: Optional[float] = None
    dropblock_size: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        block_cls = ResidualBlock if self.block_type == "residual" else BottleneckBlock
        common = dict(
            sk_ratio=self.sk_ratio, se_ratio=self.se_ratio,
            bn_momentum=self.bn_momentum, axis_name=self.axis_name,
            fused_bn=self.fused_bn, stat_groups=self.stat_groups, stat_views=self.stat_views,
            dropblock_keep_prob=self.dropblock_keep_prob,
            dropblock_size=self.dropblock_size, dtype=self.dtype,
        )
        x = block_cls(self.filters, self.strides, use_projection=True, name="block_0", **common)(x, train)
        for i in range(1, self.blocks):
            x = block_cls(self.filters, 1, name=f"block_{i}", **common)(x, train)
        return x


class ResNet(nn.Module):
    """The full encoder (tf2/resnet.py:529-699).

    Returns ``(pooled_features, endpoints)`` where ``endpoints`` carries the
    reference's named tensors: initial_conv, initial_max_pool,
    block_group1..4, final_avg_pool.
    """

    resnet_depth: int = 50
    width_multiplier: int = 1
    cifar_stem: bool = False
    sk_ratio: float = 0.0
    se_ratio: float = 0.0
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    fused_bn: Optional[bool] = None
    stat_groups: int = 1
    stat_views: int = 1
    train_mode: str = "pretrain"
    fine_tune_after_block: int = -1
    dropblock_keep_probs: Optional[Sequence[Optional[float]]] = None
    dropblock_size: Optional[int] = None
    remat_until_block: int = 0
    dtype: Any = jnp.float32
    # Optional activation re-anchoring hook (x -> x), applied after the stem
    # and after every block group.  Under FSDP the GSPMD solver can wander:
    # contracting-dim-sharded kernels admit partial-sum+all-reduce conv
    # partitionings whose replicated outputs self-sustain down the tower
    # (measured at R50/224²: 86 activation all-reduces up to 51 MB/step).
    # Pinning block boundaries back to batch sharding keeps every conv
    # batch-parallel; the trainer installs it only for FSDP meshes
    # (identity semantics — a with_sharding_constraint).
    act_constraint: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.resnet_depth not in MODEL_PARAMS:
            raise ValueError(f"Not a valid resnet_depth: {self.resnet_depth}")
        block_type, layers = MODEL_PARAMS[self.resnet_depth]
        keep_probs = self.dropblock_keep_probs or [None] * 4
        if len(keep_probs) != 4:
            raise ValueError(f"dropblock_keep_probs is not valid: {keep_probs}")
        w = self.width_multiplier
        bn = functools.partial(
            BatchNormRelu, momentum=self.bn_momentum, axis_name=self.axis_name,
            use_fused=self.fused_bn, stat_groups=self.stat_groups,
            stat_views=self.stat_views, dtype=self.dtype
        )
        endpoints = {}

        # Frozen stages run BN in inference mode, mirroring keras
        # trainable=False semantics in the reference (tf2/resnet.py:548-556):
        # stem is trainable only when not finetuning or when
        # fine_tune_after_block == -1; block group g only when
        # fine_tune_after_block <= g-1.
        finetune = self.train_mode == "finetune"
        stem_train = train and (not finetune or self.fine_tune_after_block == -1)

        x = x.astype(self.dtype)
        if self.cifar_stem:
            x = Conv2dFixedPadding(64 * w, 3, 1, dtype=self.dtype, name="initial_conv")(x)
            endpoints["initial_conv"] = x
            x = bn(name="initial_bn")(x, stem_train)
            endpoints["initial_max_pool"] = x
        else:
            if self.sk_ratio > 0:  # ResNet-D three-conv stem.
                x = Conv2dFixedPadding(64 * w // 2, 3, 2, dtype=self.dtype, name="initial_conv_0")(x)
                x = bn(name="initial_bn_0")(x, stem_train)
                x = Conv2dFixedPadding(64 * w // 2, 3, 1, dtype=self.dtype, name="initial_conv_1")(x)
                x = bn(name="initial_bn_1")(x, stem_train)
                x = Conv2dFixedPadding(64 * w, 3, 1, dtype=self.dtype, name="initial_conv_2")(x)
            else:
                if STEM_SPACE_TO_DEPTH and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                    x = _StemConvS2D(64 * w, dtype=self.dtype, name="initial_conv")(x)
                else:
                    x = Conv2dFixedPadding(64 * w, 7, 2, dtype=self.dtype, name="initial_conv")(x)
            endpoints["initial_conv"] = x
            x = bn(name="initial_bn")(x, stem_train)
            x = fixed_padding(x, 3)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
            endpoints["initial_max_pool"] = x
        if self.act_constraint is not None:
            x = self.act_constraint(x)

        group_filters = (64 * w, 128 * w, 256 * w, 512 * w)
        group_strides = (1, 2, 2, 2)
        for i in range(4):
            # Freezing boundary (tf2/resnet.py:683-687): stop gradients into
            # everything before block group i when fine_tune_after_block == i.
            if finetune and self.fine_tune_after_block == i:
                x = jax.lax.stop_gradient(x)
            group_train = train and (not finetune or self.fine_tune_after_block <= i)
            # Rematerialisation (activation checkpointing): block groups
            # [0, remat_until_block) save only their inputs and recompute
            # activations in the backward pass — trades ~1 extra forward of
            # those groups for HBM (jax.checkpoint; the early groups hold the
            # large high-resolution activations at low FLOP cost, so
            # remat_until_block=2 frees most activation memory cheaply).
            # Required for the big models (R152 3x+SK, 795M params) at
            # production batch sizes; reference has no analogue (TF handles
            # memory by lowering batch size).
            group_cls = BlockGroup
            if self.remat_until_block > i:
                group_cls = nn.remat(BlockGroup, static_argnums=(2,))
            x = group_cls(
                filters=group_filters[i], block_type=block_type, blocks=layers[i],
                strides=group_strides[i], sk_ratio=self.sk_ratio, se_ratio=self.se_ratio,
                bn_momentum=self.bn_momentum, axis_name=self.axis_name,
                fused_bn=self.fused_bn, stat_groups=self.stat_groups, stat_views=self.stat_views,
                dropblock_keep_prob=keep_probs[i], dropblock_size=self.dropblock_size,
                dtype=self.dtype, name=f"block_group{i + 1}",
            )(x, group_train)
            if self.act_constraint is not None:
                x = self.act_constraint(x)
            endpoints[f"block_group{i + 1}"] = x
        if finetune and self.fine_tune_after_block == 4:
            x = jax.lax.stop_gradient(x)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        endpoints["final_avg_pool"] = x
        return x, endpoints
