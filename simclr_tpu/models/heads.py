"""Projection and supervised heads (reference tf2/model.py:119-225,
model_util.py:109-187)."""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from simclr_tpu.models.resnet import BatchNormRelu

dense_kernel_init = nn.initializers.normal(stddev=0.01)


class LinearLayer(nn.Module):
    """Dense (stddev-.01 init) with optional BN (tf2/model.py:119-154).

    When ``use_bn`` is set the dense bias is dropped and ``use_bias``
    instead controls the BN center term — exactly the reference quirk.
    """

    num_classes: int  # -1 means "same as input dim" (lazy square layer)
    use_bias: bool = True
    use_bn: bool = False
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    fused_bn: Optional[bool] = None
    stat_groups: int = 1
    stat_views: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        assert x.ndim == 2, x.shape
        num_classes = x.shape[-1] if self.num_classes == -1 else self.num_classes
        x = nn.Dense(
            num_classes,
            use_bias=self.use_bias and not self.use_bn,
            kernel_init=dense_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dense",
        )(x)
        if self.use_bn:
            x = BatchNormRelu(
                relu=False, center=self.use_bias, momentum=self.bn_momentum,
                axis_name=self.axis_name, use_fused=self.fused_bn,
                stat_groups=self.stat_groups, stat_views=self.stat_views,
                dtype=self.dtype, name="bn_relu",
            )(x, train)
        return x


class ProjectionHead(nn.Module):
    """none | linear | nonlinear projection head (tf2/model.py:157-213).

    Returns ``(proj_output, all_layer_outputs)`` — the intermediate list is
    kept so fine-tuning can graft from layer ``ft_proj_selector``
    (0 = encoder output, -1 = final projection).
    """

    proj_head_mode: str = "nonlinear"
    proj_out_dim: int = 128
    num_proj_layers: int = 3
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    fused_bn: Optional[bool] = None
    stat_groups: int = 1
    stat_views: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        common = dict(bn_momentum=self.bn_momentum, axis_name=self.axis_name,
                      fused_bn=self.fused_bn, stat_groups=self.stat_groups,
                      stat_views=self.stat_views, dtype=self.dtype)
        if self.proj_head_mode == "none":
            return x, [x]
        hiddens_list = [x]
        if self.proj_head_mode == "linear":
            x = LinearLayer(self.proj_out_dim, use_bias=False, use_bn=True, name="l_0", **common)(x, train)
            hiddens_list.append(x)
        elif self.proj_head_mode == "nonlinear":
            for j in range(self.num_proj_layers):
                if j != self.num_proj_layers - 1:
                    x = LinearLayer(-1, use_bias=True, use_bn=True, name=f"nl_{j}", **common)(x, train)
                    x = nn.relu(x)
                else:
                    x = LinearLayer(self.proj_out_dim, use_bias=False, use_bn=True, name=f"nl_{j}", **common)(x, train)
                hiddens_list.append(x)
        else:
            raise ValueError(f"Unknown head projection mode {self.proj_head_mode}")
        return hiddens_list[-1], hiddens_list


class SupervisedHead(nn.Module):
    """Single linear classifier named head_supervised (tf2/model.py:216-225).

    The module name carries the LARS / weight-decay exclusion contract
    ('head_supervised' appears in every param path)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return LinearLayer(self.num_classes, dtype=self.dtype, name="linear_layer")(x, train)
