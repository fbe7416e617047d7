"""Combined SimCLR model: encoder + projection head + supervised head.

Re-design of reference tf2/model.py:228-280.  Unlike the reference, the
model is a pure function of (params, batch_stats, images) — the on-device
blur augmentation lives in the data pipeline (ops/augment.py), not inside
the model, so the forward pass needs no RNG in the common case.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from simclr_tpu.config import Config
from simclr_tpu.models.heads import ProjectionHead, SupervisedHead
from simclr_tpu.models.resnet import ResNet


class SimCLRModel(nn.Module):
    """Encoder + heads.

    ``__call__`` takes images of shape (num_views * B, H, W, 3) — views are
    stacked on the batch axis (the reference stacks on channels then splits,
    tf2/model.py:250-259; stacking on batch up front keeps a single big conv
    batch for the MXU and one BN statistics set over both views, which is
    what the reference's concat achieves).
    Returns (projection_outputs, supervised_logits_or_None).
    """

    num_classes: int
    resnet_depth: int = 50
    width_multiplier: int = 1
    cifar_stem: bool = False
    sk_ratio: float = 0.0
    se_ratio: float = 0.0
    bn_momentum: float = 0.9
    proj_head_mode: str = "nonlinear"
    proj_out_dim: int = 128
    num_proj_layers: int = 3
    ft_proj_selector: int = 0
    train_mode: str = "pretrain"
    fine_tune_after_block: int = -1
    lineareval_while_pretraining: bool = True
    remat_until_block: int = 0
    axis_name: Optional[str] = None
    # Ghost batch norm for --global_bn=False under GSPMD (reference
    # resnet.py:73-85 per-replica statistics): group count = number of data
    # shards, views-major row layout.  1 = global statistics.
    bn_stat_groups: int = 1
    # Per-instance fused-VJP BN choice (None = process default); carried on
    # the model instead of global state so constructing a second model
    # (serving load, distill teacher/student) cannot flip the BN
    # implementation of models traced afterwards (ADVICE r2).
    fused_bn: Optional[bool] = None
    dtype: Any = jnp.float32
    # FSDP activation re-anchoring hook (see ResNet.act_constraint).
    act_constraint: Any = None

    @classmethod
    def from_config(cls, config: Config, num_classes: int,
                    axis_name: Optional[str] = None, bn_stat_groups: int = 1,
                    act_constraint=None):
        # axis_name reaches the BatchNorm layers: inside shard_map/pmap it
        # turns on cross-replica statistics (--global_bn). Under GSPMD
        # (axis_name=None) statistics are global automatically; with
        # --global_bn=False the trainer passes bn_stat_groups = data-shard
        # count and BN computes ghost (per-replica) statistics instead.
        if axis_name is not None and not config.global_bn:
            axis_name = None  # per-replica BN stats (reference global_bn=False)
        if config.global_bn or axis_name is not None:
            bn_stat_groups = 1
        return cls(
            num_classes=num_classes,
            resnet_depth=config.resnet_depth,
            width_multiplier=config.width_multiplier,
            cifar_stem=config.image_size <= 32,
            sk_ratio=config.sk_ratio,
            se_ratio=config.se_ratio,
            bn_momentum=config.batch_norm_decay,
            proj_head_mode=config.proj_head_mode,
            proj_out_dim=config.proj_out_dim,
            num_proj_layers=config.num_proj_layers,
            ft_proj_selector=config.ft_proj_selector,
            train_mode=config.train_mode,
            fine_tune_after_block=config.fine_tune_after_block,
            lineareval_while_pretraining=config.lineareval_while_pretraining,
            remat_until_block=config.remat_until_block,
            axis_name=axis_name,
            bn_stat_groups=bn_stat_groups,
            fused_bn=config.fused_bn,
            act_constraint=act_constraint,
            dtype=jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32,
        )

    @nn.compact
    def __call__(self, images, train: bool, return_endpoints: bool = False):
        # Ghost-BN row layout: pretrain stacks two views views-major on the
        # batch axis, so a data shard's rows are (its chunk of view0, its
        # chunk of view1) — stat_views tells BN how to regroup them.
        stat_views = 2 if self.train_mode == "pretrain" else 1
        features, endpoints = ResNet(
            resnet_depth=self.resnet_depth,
            width_multiplier=self.width_multiplier,
            cifar_stem=self.cifar_stem,
            sk_ratio=self.sk_ratio,
            se_ratio=self.se_ratio,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            stat_groups=self.bn_stat_groups,
            stat_views=stat_views,
            train_mode=self.train_mode,
            fine_tune_after_block=self.fine_tune_after_block,
            remat_until_block=self.remat_until_block,
            fused_bn=self.fused_bn,
            act_constraint=self.act_constraint,
            dtype=self.dtype,
            name="resnet",
        )(images, train)

        proj_out, proj_hiddens = ProjectionHead(
            proj_head_mode=self.proj_head_mode,
            proj_out_dim=self.proj_out_dim,
            num_proj_layers=self.num_proj_layers,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            stat_groups=self.bn_stat_groups,
            stat_views=stat_views,
            fused_bn=self.fused_bn,
            dtype=self.dtype,
            name="projection_head",
        )(features, train)
        proj_out = proj_out.astype(jnp.float32)
        endpoints["proj_head_input"] = features
        endpoints["proj_head_output"] = proj_out

        # Supervised head input: ft_proj_selector'th projection intermediate
        # (tf2/model.py:268-271); trained on stop-grad features during
        # pretraining (tf2/model.py:272-278).
        supervised_logits = None
        if self.train_mode == "finetune" or self.lineareval_while_pretraining:
            ft_input = proj_hiddens[self.ft_proj_selector]
            if self.train_mode == "pretrain":
                ft_input = jax.lax.stop_gradient(ft_input)
            supervised_logits = SupervisedHead(
                self.num_classes, dtype=self.dtype, name="head_supervised"
            )(ft_input, train).astype(jnp.float32)
            endpoints["logits_sup"] = supervised_logits

        if return_endpoints:
            return proj_out, supervised_logits, endpoints
        return proj_out, supervised_logits
