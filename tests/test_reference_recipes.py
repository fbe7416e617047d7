"""Every reference README recipe command line must parse and resolve here.

The commands are copied verbatim from /root/reference/README.md (cited per
case) — the CLI is flag-compatible, so a reference user should be able to
paste their launch command.  This exercises flag COMBINATIONS (the
--train_summary_steps=0 crash was exactly such a miss), resolving schedule
/ step counts and building the model+optimizer for each, without training.
"""

import shlex

import pytest

from simclr_tpu.config import (get_checkpoint_steps, get_train_steps,
                               parse_flags, resolve_use_fused_ntxent)
from simclr_tpu.models.model import SimCLRModel
from simclr_tpu.optim.builder import build_optimizer, trainable_mask
from simclr_tpu.optim.schedule import warmup_cosine_schedule

RECIPES = {
    # README.md:79-84 — CIFAR-10 pretrain, single GPU.
    "cifar10_pretrain": """
      --train_mode=pretrain
      --train_batch_size=512 --train_epochs=1000
      --learning_rate=1.0 --weight_decay=1e-4 --temperature=0.5
      --dataset=cifar10 --image_size=32 --eval_split=test --resnet_depth=18
      --use_blur=False --color_jitter_strength=0.5
      --model_dir=/tmp/simclr_test --use_tpu=False
    """,
    # README.md:100-108 — ImageNet R50 pretrain, batch 4096 on TPU.
    "imagenet_pretrain": """
      --train_mode=pretrain
      --train_batch_size=4096 --train_epochs=100 --temperature=0.1
      --learning_rate=0.075 --learning_rate_scaling=sqrt --weight_decay=1e-4
      --dataset=imagenet2012 --image_size=224 --eval_split=validation
      --model_dir=/tmp/m --use_tpu=True --tpu_name=x --train_summary_steps=0
    """,
    # README.md:119-127 — CIFAR-10 linear eval.
    "cifar10_linear_eval": """
      --mode=train_then_eval --train_mode=finetune
      --fine_tune_after_block=4 --zero_init_logits_layer=True
      --variable_schema=(?!global_step|(?:.*/|^)Momentum|head)
      --global_bn=False --optimizer=momentum --learning_rate=0.1
      --weight_decay=0.0
      --train_epochs=100 --train_batch_size=512 --warmup_epochs=0
      --dataset=cifar10 --image_size=32 --eval_split=test --resnet_depth=18
      --checkpoint=/tmp/simclr_test --model_dir=/tmp/simclr_test_ft
      --use_tpu=False
    """,
    # README.md:137-146 — ImageNet linear eval.
    "imagenet_linear_eval": """
      --mode=train_then_eval --train_mode=finetune
      --fine_tune_after_block=4 --zero_init_logits_layer=True
      --variable_schema=(?!global_step|(?:.*/|^)Momentum|head)
      --global_bn=False --optimizer=momentum --learning_rate=0.1
      --weight_decay=1e-6
      --train_epochs=90 --train_batch_size=4096 --warmup_epochs=0
      --dataset=imagenet2012 --image_size=224 --eval_split=validation
      --model_dir=/tmp/m --checkpoint=/tmp/c
      --use_tpu=True --tpu_name=x --train_summary_steps=0
    """,
    # README.md:157-167 — 1% semi-supervised finetune.
    "imagenet_1pct_finetune": """
      --mode=train_then_eval --train_mode=finetune
      --fine_tune_after_block=-1 --zero_init_logits_layer=True
      --variable_schema=(?!global_step|(?:.*/|^)Momentum|head_supervised)
      --global_bn=True --optimizer=lars --learning_rate=0.005
      --learning_rate_scaling=sqrt --weight_decay=0
      --train_epochs=60 --train_batch_size=1024 --warmup_epochs=0
      --dataset=imagenet2012_subset/1pct --image_size=224
      --eval_split=validation --model_dir=/tmp/m --checkpoint=/tmp/c
      --use_tpu=True --tpu_name=x --train_summary_steps=0
      --num_proj_layers=3 --ft_proj_selector=1
    """,
}

NUM_EXAMPLES = {
    "cifar10_pretrain": 50_000,
    "imagenet_pretrain": 1_281_167,
    "cifar10_linear_eval": 50_000,
    "imagenet_linear_eval": 1_281_167,
    "imagenet_1pct_finetune": 12_811,
}


@pytest.mark.parametrize("name", sorted(RECIPES))
def test_reference_recipe_resolves(name):
    config = parse_flags(shlex.split(RECIPES[name]))
    n = NUM_EXAMPLES[name]

    steps = get_train_steps(config, n)
    assert steps > 0
    assert get_checkpoint_steps(config, n) > 0
    assert isinstance(resolve_use_fused_ntxent(config, 8), bool)

    lr_fn = warmup_cosine_schedule(config, n)
    assert float(lr_fn(0)) >= 0.0 and float(lr_fn(steps - 1)) >= 0.0

    model = SimCLRModel.from_config(config, num_classes=10)
    tx = build_optimizer(config, lr_fn)
    assert tx is not None

    # Finetune recipes must produce a non-empty trainable set even with
    # fine_tune_after_block=4 (heads only).
    import jax
    import jax.numpy as jnp

    small = config.replace(image_size=32)
    m_small = SimCLRModel.from_config(small, num_classes=10)
    variables = m_small.init(jax.random.PRNGKey(0),
                             jnp.zeros((2, 32, 32, 3)), train=False)
    mask = trainable_mask(config, variables["params"])
    assert any(jax.tree.leaves(mask)), "no trainable parameters resolved"
