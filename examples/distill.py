"""Distill a finetuned teacher into a small student (reference
tf2/colabs/distillation_self_training.ipynb recipe).

Usage:
  python examples/distill.py --teacher <model_dir>/saved_model/<step> \
      --dataset synthetic --steps 100
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.config import Config
from simclr_tpu.data.loader import Prefetcher, build_dataset
from simclr_tpu.distill import StudentConvNet, default_student_optimizer, make_distill_step
from simclr_tpu.export import load_serving


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--teacher", required=True, help="serving bundle path")
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--learning_rate", type=float, default=2.0)
    args = p.parse_args()

    config = Config(dataset=args.dataset, image_size=args.image_size,
                    train_batch_size=args.batch_size)
    ds, info = build_dataset(config, is_training=True)

    serve = load_serving(args.teacher)
    teacher_fn = lambda images: serve(images)["logits_sup"]

    student = StudentConvNet(num_classes=info.num_classes)
    sample = jnp.zeros((2, args.image_size, args.image_size, 3))
    variables = student.init(jax.random.PRNGKey(0), sample, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = default_student_optimizer(args.steps, learning_rate=args.learning_rate)
    opt_state = tx.init(params)
    step = jax.jit(make_distill_step(student, teacher_fn, tx, args.temperature))

    it = iter(Prefetcher(ds))
    for i in range(args.steps):
        batch = next(it)
        images = jnp.asarray(batch["image"], jnp.float32) / 255.0
        if images.shape[1] != args.image_size:
            images = jax.image.resize(
                images, (images.shape[0], args.image_size, args.image_size, 3), "cubic")
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state, images)
        if i % 10 == 0:
            print(f"step {i}: kd_loss={float(loss):.4f}")


if __name__ == "__main__":
    main()
