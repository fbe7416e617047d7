"""DigitOnImage experiment ("Intriguing Properties of Contrastive Losses" —
reference colabs/intriguing_properties/digits_on_tf_flowers.ipynb).

Pastes an MNIST digit at a random position onto a larger natural-ish
background whose class is encoded by its color/texture, pretrains a ConvN
with the simplified NT-Xent on two random crops, and linearly probes the
frozen features for BOTH the digit label and the background label.  The
intriguing property: contrastive features latch onto one competing feature
(typically the simpler, augmentation-stable one) at the expense of the
other — the two probe accuracies diverge.

tf_flowers is not downloadable in every environment, so backgrounds default
to synthetic class-colored textures; digits come from MNIST via tfds when
available, else a synthetic digit-like set.

Usage:  python examples/digits_on_images.py --steps 400
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from simclr_tpu.experimental.intriguing import (
    ConvN, digit_on_image, simple_contrastive_loss,
)
from simclr_tpu.ops.augment import crop_and_resize


def load_digits(n=4096):
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


def make_backgrounds(n, size, num_classes=10, seed=1):
    """Class-colored textured backgrounds (stand-in for tf_flowers)."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, num_classes, size=n)
    hues = np.linspace(0.0, 1.0, num_classes, endpoint=False)
    base = np.stack([  # distinct RGB per class
        np.abs(np.sin(2 * np.pi * (hues + s))) for s in (0.0, 1 / 3, 2 / 3)
    ], axis=-1)  # (classes, 3)
    noise = rng.uniform(0.0, 0.35, size=(n, size, size, 3))
    images = 0.65 * base[labels][:, None, None, :] + noise
    return images.astype(np.float32), labels


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.1)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    args = p.parse_args()

    digits, digit_labels = load_digits()
    digits = digits.astype(np.float32) / 255.0
    n = len(digits)
    backgrounds, bg_labels = make_backgrounds(n, args.image_size)

    # Compose once (notebook cell 3): one paste position per example.
    paste = jax.jit(jax.vmap(digit_on_image))
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.PRNGKey(2), jnp.arange(n))
    composed = np.asarray(paste(jnp.asarray(digits), jnp.asarray(backgrounds), keys))

    model = ConvN(width_multiplier=1)
    x0 = jnp.zeros((2, args.image_size, args.image_size, 3))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    # Extra linear probe for the background label on the same frozen features
    # (the built-in ConvN classifier probes the digit label).
    feat_dim = model.apply(variables, x0, train=False)[0].shape[-1]
    bg_head = {"kernel": jnp.zeros((feat_dim, 10)), "bias": jnp.zeros((10,))}
    tx = optax.adam(optax.polynomial_schedule(args.learning_rate, 0.0, 1.0, args.steps))
    opt_state = tx.init((params, bg_head))

    @jax.jit
    def step(params, bg_head, batch_stats, opt_state, batch, dig_b, bg_b, key):
        k1, k2 = jax.random.split(key)
        s = args.image_size
        view_a = crop_and_resize(batch, k1, s, s)
        view_b = crop_and_resize(batch, k2, s, s)

        def loss_fn(p):
            params_, bg_head_ = p
            (h, za, pred_digit), mut = model.apply(
                {"params": params_, "batch_stats": batch_stats}, view_a,
                train=True, mutable=["batch_stats"])
            (_, zb, _), mut = model.apply(
                {"params": params_, "batch_stats": mut["batch_stats"]}, view_b,
                train=True, mutable=["batch_stats"])
            con, _ = simple_contrastive_loss(za, zb, args.temperature)
            h = jax.lax.stop_gradient(h)
            pred_bg = h @ bg_head_["kernel"] + bg_head_["bias"]

            def probe_loss(pred, labels_b):
                one_hot = jax.nn.one_hot(labels_b, 10)
                ce = -jnp.mean(jnp.sum(one_hot * jax.nn.log_softmax(pred, -1), -1))
                acc = jnp.mean((jnp.argmax(pred, -1) == labels_b).astype(jnp.float32))
                return ce, acc

            ce_d, acc_d = probe_loss(pred_digit, dig_b)
            ce_b, acc_b = probe_loss(pred_bg, bg_b)
            return con + ce_d + ce_b, (mut["batch_stats"], con, acc_d, acc_b)

        grads, (new_bs, con, acc_d, acc_b) = jax.grad(
            loss_fn, has_aux=True)((params, bg_head))
        updates, new_opt = tx.update(grads, opt_state, (params, bg_head))
        new_params, new_bg = optax.apply_updates((params, bg_head), updates)
        return new_params, new_bg, new_bs, new_opt, con, acc_d, acc_b

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(1)
    for i in range(args.steps):
        idx = rng.randint(0, n, size=args.batch_size)
        params, bg_head, batch_stats, opt_state, con, acc_d, acc_b = step(
            params, bg_head, batch_stats, opt_state,
            jnp.asarray(composed[idx]),
            jnp.asarray(digit_labels[idx].astype(np.int32)),
            jnp.asarray(bg_labels[idx].astype(np.int32)),
            jax.random.fold_in(key, i))
        if i % 50 == 0:
            print(f"step {i}: contrastive_loss={float(con):.4f} "
                  f"digit_probe_acc={float(acc_d):.3f} "
                  f"background_probe_acc={float(acc_b):.3f}")
    print(f"final: digit probe {float(acc_d):.3f} vs background probe "
          f"{float(acc_b):.3f} (feature competition)")


if __name__ == "__main__":
    main()
