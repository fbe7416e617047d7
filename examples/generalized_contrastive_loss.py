"""Generalized contrastive loss experiment ("Intriguing Properties of
Contrastive Losses" — reference
colabs/intriguing_properties/generalized_contrastive_loss.ipynb cells 2-3).

NT-Xent decomposes into alignment + distribution matching; this trains a
small ConvN with ``loss = align + lambda * dist_match`` where the
distribution term is either the decoupled logsumexp or a sliced-Wasserstein
distance to a prior (normal / uniform / hypersphere via random orthogonal
projections), and reports a linear probe on the true labels.

Runs on MNIST via tfds when available, else on a synthetic digit-like set.

Usage:  python examples/generalized_contrastive_loss.py --dist normal --steps 400
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from simclr_tpu.experimental.intriguing import ConvN
from simclr_tpu.objectives.generalized import generalized_contrastive_loss
from simclr_tpu.ops.augment import crop_and_resize


def load_images(n=4096):
    try:
        import tensorflow_datasets as tfds

        ds = tfds.load("mnist", split="train", as_supervised=True)
        images, labels = [], []
        for img, lab in tfds.as_numpy(ds.take(n)):
            images.append(img)
            labels.append(lab)
        return np.stack(images), np.asarray(labels)
    except Exception:
        rng = np.random.RandomState(0)
        labels = rng.randint(0, 10, size=n)
        images = rng.randint(0, 30, size=(n, 28, 28, 1)).astype(np.int32)
        for i, k in enumerate(labels):  # class-dependent stripe pattern
            images[i, :, k * 2:k * 2 + 3, :] += 200
        return np.clip(images, 0, 255).astype(np.uint8), labels


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dist", default="normal",
                   choices=["normal", "uniform", "hypersphere", "logsumexp"],
                   help="distribution-matching term (notebook cell 3)")
    p.add_argument("--lambda_weight", type=float, default=1.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    args = p.parse_args()

    images, labels = load_images()
    images = images.astype(np.float32) / 255.0
    c = images.shape[-1]

    model = ConvN(width_multiplier=1)
    x0 = jnp.zeros((2, 28, 28, c))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(optax.polynomial_schedule(args.learning_rate, 0.0, 1.0, args.steps))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, batch, labels_b, key):
        k1, k2, k_loss = jax.random.split(key, 3)
        view_a = crop_and_resize(batch, k1, 28, 28)
        view_b = crop_and_resize(batch, k2, 28, 28)

        def loss_fn(p):
            (_, za, pred_a), mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, view_a, train=True,
                mutable=["batch_stats"])
            (_, zb, _), mut = model.apply(
                {"params": p, "batch_stats": mut["batch_stats"]}, view_b, train=True,
                mutable=["batch_stats"])
            con = generalized_contrastive_loss(
                za, zb, key=k_loss, lambda_weight=args.lambda_weight,
                temperature=args.temperature, dist=args.dist)
            # Linear probe on stop-gradient features (training signal for the
            # report only, like the notebook's separate eval).
            one_hot = jax.nn.one_hot(labels_b, 10)
            cls = -jnp.mean(jnp.sum(one_hot * jax.nn.log_softmax(pred_a, -1), -1))
            acc = jnp.mean((jnp.argmax(pred_a, -1) == labels_b).astype(jnp.float32))
            return con + cls, (mut["batch_stats"], con, acc)

        grads, (new_bs, con, acc) = jax.grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, con, acc

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(1)
    for i in range(args.steps):
        idx = rng.randint(0, len(images), size=args.batch_size)
        batch = jnp.asarray(images[idx])
        labs = jnp.asarray(labels[idx].astype(np.int32))
        params, batch_stats, opt_state, con, acc = step(
            params, batch_stats, opt_state, batch, labs, jax.random.fold_in(key, i))
        if i % 50 == 0:
            print(f"step {i}: generalized_loss({args.dist})={float(con):.4f} "
                  f"linear_probe_acc={float(acc):.3f}")
    print(f"final (dist={args.dist}, lambda={args.lambda_weight}): "
          f"probe acc {float(acc):.3f}")


if __name__ == "__main__":
    main()
