"""Fine-tune a linear head on top of an exported serving bundle
(reference colabs/finetuning.ipynb / tf2/colabs/finetuning.ipynb parity:
``saved_model(x, trainable=False)['final_avg_pool']`` -> linear head).

For full-model fine-tuning use the CLI (`--train_mode=finetune`); this
example is the lightweight colab workflow on frozen exported features.

Usage:
  python examples/finetuning.py --model <model_dir>/saved_model/<step> \
      --dataset synthetic --steps 200
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from simclr_tpu.config import Config
from simclr_tpu.data.loader import Prefetcher, build_dataset
from simclr_tpu.export import load_serving
from simclr_tpu.ops.augment import preprocess_for_train, preprocess_for_eval


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--learning_rate", type=float, default=0.1)
    p.add_argument("--momentum", type=float, default=0.9)
    args = p.parse_args()

    config = Config(dataset=args.dataset, image_size=args.image_size,
                    train_batch_size=args.batch_size, eval_batch_size=args.batch_size)
    ds, info = build_dataset(config, is_training=True)
    serve = load_serving(args.model)

    feat_dim = serve(jnp.zeros((1, args.image_size, args.image_size, 3)))["final_avg_pool"].shape[-1]
    head = {"w": jnp.zeros((feat_dim, info.num_classes)), "b": jnp.zeros((info.num_classes,))}
    tx = optax.sgd(optax.cosine_decay_schedule(args.learning_rate, args.steps),
                   momentum=args.momentum, nesterov=True)
    opt_state = tx.init(head)

    @jax.jit
    def step(head, opt_state, images, labels, key):
        images = preprocess_for_train(images, key, args.image_size, args.image_size)
        feats = jax.lax.stop_gradient(serve(images)["final_avg_pool"])

        def loss_fn(h):
            logits = feats @ h["w"] + h["b"]
            one_hot = jax.nn.one_hot(labels, info.num_classes)
            loss = -jnp.mean(jnp.sum(one_hot * jax.nn.log_softmax(logits, -1), -1))
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(head)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(head, updates), opt_state, loss, acc

    key = jax.random.PRNGKey(0)
    it = iter(Prefetcher(ds))
    for i in range(args.steps):
        batch = next(it)
        images = jnp.asarray(batch["image"], jnp.float32) / 255.0
        head, opt_state, loss, acc = step(
            head, opt_state, images, jnp.asarray(batch["label"]),
            jax.random.fold_in(key, i))
        if i % 20 == 0:
            print(f"step {i}: loss={float(loss):.4f} acc={float(acc):.3f}")
    print(f"final train acc: {float(acc):.3f}")


if __name__ == "__main__":
    main()
