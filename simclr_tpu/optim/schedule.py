"""Warmup + cosine-decay LR schedule with batch-size scaling.

Reference: model_util.py:59-83 (TF1) and tf2/model.py:78-116
(WarmUpAndCosineDecay).  Semantics preserved exactly:
  * scaled_lr = lr * bsz/256 (linear) or lr * sqrt(bsz) (sqrt);
  * linear warmup over round(warmup_epochs * num_examples / bsz) steps;
  * cosine decay of scaled_lr to 0 over (total_steps - warmup_steps),
    evaluated at (step - warmup_steps).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from simclr_tpu.config import Config, get_train_steps


def scaled_learning_rate(config: Config) -> float:
    if config.learning_rate_scaling == "linear":
        return config.learning_rate * config.train_batch_size / 256.0
    elif config.learning_rate_scaling == "sqrt":
        return config.learning_rate * math.sqrt(config.train_batch_size)
    raise ValueError(f"Unknown learning rate scaling {config.learning_rate_scaling}")


def warmup_cosine_schedule(config: Config, num_examples: int):
    """Returns step -> lr, traceable under jit."""
    scaled_lr = scaled_learning_rate(config)
    warmup_steps = int(round(config.warmup_epochs * num_examples // config.train_batch_size))
    total_steps = get_train_steps(config, num_examples)
    decay_steps = max(1, total_steps - warmup_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup_steps * scaled_lr if warmup_steps else scaled_lr
        progress = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
        cosine = scaled_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cosine)

    return schedule
