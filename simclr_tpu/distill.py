"""Distillation / self-training (reference C19:
tf2/colabs/distillation_self_training.ipynb cells 8-10).

Big finetuned teacher -> small student via temperature-scaled KD loss
``T^2 * CE(softmax(teacher/T), student/T)``, LARS on the student only.
Teachers come from the serving export (export.py); students may be any
flax module producing ``logits_sup``-style outputs (a SimCLR ResNet of
smaller depth, or the notebook-style small ConvNet below).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from simclr_tpu.optim.lars import lars


def add_kd_loss(student_logits, teacher_logits, temperature: float = 1.0):
    """Distillation loss (notebook cell 8)."""
    teacher_probs = jax.nn.softmax(teacher_logits.astype(jnp.float32) / temperature)
    logp = jax.nn.log_softmax(student_logits.astype(jnp.float32) / temperature, axis=-1)
    return jnp.mean(temperature ** 2 * -jnp.sum(teacher_probs * logp, axis=-1))


class StudentConvNet(nn.Module):
    """The notebook's small student (cell 8): 3 conv-BN-relu-pool stages,
    GAP, dense 512, dense num_classes."""

    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for i, feats in enumerate((64, 128, 256)):
            x = nn.Conv(feats, (3, 3), padding="VALID", dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"batch_norm_{i}")(x)
            x = nn.relu(x)
            if i < 2:
                x = nn.max_pool(x, (4, 4), strides=(4, 4))
        x = jnp.mean(x, axis=(1, 2))
        x = nn.relu(nn.Dense(512, dtype=self.dtype, name="dense_0")(x))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="logits")(x).astype(jnp.float32)


def make_distill_step(
    student: nn.Module,
    teacher_fn: Callable[[jnp.ndarray], jnp.ndarray],
    tx: optax.GradientTransformation,
    temperature: float = 1.0,
    label_smoothing_ground_truth: bool = False,
) -> Callable:
    """Build a jittable distillation step.

    teacher_fn: images -> teacher logits (e.g. from export.load_serving,
    ``lambda x: serve(x)['logits_sup']``); treated as constant (no grads).
    """

    def step(params, batch_stats, opt_state, images):
        teacher_logits = jax.lax.stop_gradient(teacher_fn(images))

        def loss_fn(p):
            student_logits, mutated = student.apply(
                {"params": p, "batch_stats": batch_stats}, images, train=True,
                mutable=["batch_stats"],
            )
            loss = add_kd_loss(student_logits, teacher_logits, temperature)
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bs, new_opt, loss

    return step


def default_student_optimizer(total_steps: int, learning_rate: float = 2.0,
                              momentum: float = 0.9, weight_decay: float = 1e-4):
    """Notebook cell 10 recipe: cosine-decay LARS, BN/bias excluded."""
    sched = optax.cosine_decay_schedule(learning_rate, total_steps)
    return lars(sched, momentum=momentum, weight_decay=weight_decay,
                exclude_from_weight_decay=("batch_norm", "bias"))
