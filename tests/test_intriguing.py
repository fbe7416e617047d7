"""Tests for the intriguing-properties experiment suite (C20)."""

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.experimental.intriguing import (
    ConvN,
    digit_on_image,
    image_to_bits,
    pack_extra_channels,
    simple_contrastive_loss,
)


def test_image_to_bits_deterministic_and_uniform():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, size=(64, 8, 8, 1), dtype=np.uint8)
    bits_a = np.stack([image_to_bits(im, 13) for im in imgs])
    bits_b = np.stack([image_to_bits(im, 13) for im in imgs])
    np.testing.assert_array_equal(bits_a, bits_b)  # deterministic
    assert bits_a.shape == (64, 13)
    assert 0.3 < bits_a.mean() < 0.7  # roughly uniform
    # distinct images get distinct bit patterns (w.h.p.)
    assert len({tuple(b) for b in bits_a}) > 60


def test_pack_extra_channels():
    imgs = np.zeros((2, 28, 28, 1), np.uint8)
    imgs[1] += 1
    out = pack_extra_channels(imgs, 10)
    assert out.shape == (2, 28, 28, 11)
    # bit channels constant across space
    assert np.all(out[:, :, :, 1:].std(axis=(1, 2)) == 0)


def test_convn_forward():
    model = ConvN(width_multiplier=1)
    x = jnp.zeros((4, 28, 28, 11))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y, z, pred = model.apply(variables, x, train=False)
    assert y.shape == (4, 128)
    assert z.shape == (4, 64)
    assert pred.shape == (4, 10)


def test_convn_classifier_stopgrad():
    model = ConvN(width_multiplier=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 28, 28, 1))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)

    def cls_loss(params):
        _, _, pred = model.apply({**variables, "params": params}, x, train=False)
        return jnp.sum(pred ** 2)

    grads = jax.grad(cls_loss)(variables["params"])
    enc_norm = sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(
        {k: v for k, v in grads.items() if k.startswith("enc")}))
    assert float(enc_norm) == 0.0


def test_simple_contrastive_loss_eye_labels():
    z = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
    loss_same, sim = simple_contrastive_loss(z, z, temperature=0.1)
    loss_rand, _ = simple_contrastive_loss(
        z, jax.random.normal(jax.random.PRNGKey(1), (8, 16)), temperature=0.1)
    assert float(loss_same) < float(loss_rand)
    assert sim.shape == (8, 8)


def test_digit_on_image():
    digit = jnp.ones((28, 28, 1))
    bg = jnp.zeros((64, 64, 3))
    out = digit_on_image(digit, bg, jax.random.PRNGKey(0))
    assert out.shape == (64, 64, 3)
    assert float(jnp.sum(out)) == 28 * 28 * 3  # digit fully pasted once
