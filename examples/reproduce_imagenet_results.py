"""Reproduce ImageNet validation results for released SimCLR checkpoints.

Port of the de-facto regression suite tf2/colabs/imagenet_results.ipynb
(reference SURVEY.md §4: re-run validation over released checkpoints and
compare to the paper tables; GPU-vs-TPU deltas <= 0.1%).

Usage:
  python examples/reproduce_imagenet_results.py \
      --checkpoint /path/to/r50_1x_sk0/model.ckpt-250228 \
      --resnet_depth 50 --width_multiplier 1 --sk_ratio 0 \
      --dataset imagenet2012 --data_dir /tfds

Expected numbers (reference README.md:19-33): R50 1x linear 71.7,
R50 1x+SK 74.6, R152 3x+SK 79.8, ...
"""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.checkpoint_compat import import_tf_checkpoint
from simclr_tpu.config import Config
from simclr_tpu.data.loader import build_dataset
from simclr_tpu.models.model import SimCLRModel
from simclr_tpu.ops import augment


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help="TF checkpoint prefix")
    p.add_argument("--resnet_depth", type=int, default=50)
    p.add_argument("--width_multiplier", type=int, default=1)
    p.add_argument("--sk_ratio", type=float, default=0.0)
    p.add_argument("--dataset", default="imagenet2012")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--eval_batch_size", type=int, default=256)
    p.add_argument("--image_size", type=int, default=224)
    args = p.parse_args()

    config = Config(
        resnet_depth=args.resnet_depth, width_multiplier=args.width_multiplier,
        sk_ratio=args.sk_ratio, dataset=args.dataset, data_dir=args.data_dir,
        image_size=args.image_size, eval_batch_size=args.eval_batch_size,
        train_mode="finetune", fine_tune_after_block=-1,
    )
    ds, info = build_dataset(config, is_training=False)
    model = SimCLRModel.from_config(config, info.num_classes)
    params, batch_stats = import_tf_checkpoint(config, args.checkpoint)

    @jax.jit
    def eval_step(images, labels):
        images = augment.preprocess_for_eval(images.astype(jnp.float32) / 255.0,
                                             config.image_size, config.image_size)
        _, logits = model.apply({"params": params, "batch_stats": batch_stats},
                                images, train=False)
        top1 = jnp.argmax(logits, -1) == labels
        top5 = jnp.any(jax.lax.top_k(logits, 5)[1] == labels[:, None], -1)
        return jnp.sum(top1), jnp.sum(top5)

    top1 = top5 = count = 0
    for batch in ds:
        t1, t5 = eval_step(jnp.asarray(batch["image"]), jnp.asarray(batch["label"]))
        top1 += int(t1); top5 += int(t5); count += len(batch["label"])
        if count >= info.num_eval_examples:
            break
    print(json.dumps({
        "checkpoint": args.checkpoint,
        "top_1": top1 / count, "top_5": top5 / count, "count": count,
    }, indent=2))


if __name__ == "__main__":
    main()
