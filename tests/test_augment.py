"""Augmentation-op tests vs TensorFlow oracles (tf.image is the semantics
the reference delegates to — SURVEY.md §2.3 N6-N9) plus statistical checks
for the stochastic ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simclr_tpu.ops import augment

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def rgb_batch():
    rng = np.random.RandomState(0)
    return rng.uniform(0, 1, size=(4, 24, 24, 3)).astype(np.float32)


def test_rgb_hsv_roundtrip(rgb_batch):
    hsv = augment.rgb_to_hsv(jnp.asarray(rgb_batch))
    back = augment.hsv_to_rgb(hsv)
    np.testing.assert_allclose(np.asarray(back), rgb_batch, atol=1e-5)


def test_rgb_to_hsv_matches_tf(rgb_batch):
    ours = np.asarray(augment.rgb_to_hsv(jnp.asarray(rgb_batch)))
    theirs = tf.image.rgb_to_hsv(rgb_batch).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grayscale_matches_tf(rgb_batch):
    ours = np.asarray(augment.rgb_to_grayscale(jnp.asarray(rgb_batch)))
    theirs = tf.tile(tf.image.rgb_to_grayscale(rgb_batch), [1, 1, 1, 3]).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-2)  # TF uses slightly different weights


def test_saturation_matches_tf(rgb_batch):
    # Deterministic factor: drive our op with a key then compare against the
    # TF op applied with the same factor.
    factor = 1.3
    hsv = tf.image.rgb_to_hsv(rgb_batch)
    s = tf.clip_by_value(hsv[..., 1] * factor, 0.0, 1.0)
    expected = tf.image.hsv_to_rgb(tf.stack([hsv[..., 0], s, hsv[..., 2]], -1)).numpy()
    hsv_j = augment.rgb_to_hsv(jnp.asarray(rgb_batch))
    hsv_j = hsv_j.at[..., 1].set(jnp.clip(hsv_j[..., 1] * factor, 0.0, 1.0))
    ours = np.asarray(augment.hsv_to_rgb(hsv_j))
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_contrast_matches_tf(rgb_batch):
    factor = 0.7
    expected = tf.image.adjust_contrast(rgb_batch, factor).numpy()
    mean = rgb_batch.mean(axis=(1, 2), keepdims=True)
    ours = (rgb_batch - mean) * factor + mean
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_center_crop_matches_tf():
    rng = np.random.RandomState(1)
    imgs = rng.uniform(0, 1, size=(2, 40, 56, 3)).astype(np.float32)
    ours = np.asarray(augment.center_crop(jnp.asarray(imgs), 24, 24))
    theirs = np.stack([
        tf.image.resize(
            tf.image.crop_to_bounding_box(
                im,
                ((40 - round(0.875 * 40)) + 1) // 2,
                ((56 - round(0.875 * 40)) + 1) // 2,
                round(0.875 * 40), round(0.875 * 40),
            )[None], [24, 24], method="bicubic",
        )[0].numpy()
        for im in imgs
    ])
    np.testing.assert_allclose(ours, theirs, atol=2e-2)


def test_gaussian_blur_matches_tf():
    rng = np.random.RandomState(2)
    imgs = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    sigma = 1.2
    kernel_size = 32 // 10
    ours = np.asarray(
        augment.gaussian_blur(jnp.asarray(imgs), jnp.full((2,), sigma), kernel_size)
    )
    # TF oracle mirroring data_util.py:328-366.
    radius = kernel_size // 2
    x = tf.cast(tf.range(-radius, radius + 1), tf.float32)
    blur_filter = tf.exp(-tf.pow(x, 2.0) / (2.0 * sigma ** 2))
    blur_filter /= tf.reduce_sum(blur_filter)
    blur_v = tf.reshape(blur_filter, [2 * radius + 1, 1, 1, 1])
    blur_h = tf.reshape(blur_filter, [1, 2 * radius + 1, 1, 1])
    blur_h = tf.tile(blur_h, [1, 1, 3, 1])
    blur_v = tf.tile(blur_v, [1, 1, 3, 1])
    out = tf.nn.depthwise_conv2d(imgs, blur_h, [1, 1, 1, 1], "SAME")
    out = tf.nn.depthwise_conv2d(out, blur_v, [1, 1, 1, 1], "SAME").numpy()
    np.testing.assert_allclose(ours, out, atol=1e-5)


def test_flip_is_per_image_and_preserves_content():
    imgs = jnp.arange(4 * 8 * 8 * 3, dtype=jnp.float32).reshape(4, 8, 8, 3)
    out = augment.random_flip_left_right(imgs, jax.random.PRNGKey(0))
    for i in range(4):
        same = np.allclose(out[i], imgs[i])
        flipped = np.allclose(out[i], imgs[i, :, ::-1, :])
        assert same or flipped


def test_crop_and_resize_shapes_and_range():
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (4, 40, 40, 3))
    out = augment.crop_and_resize(imgs, jax.random.PRNGKey(1), 24, 24)
    assert out.shape == (4, 24, 24, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_sample_distorted_box_constraints():
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    H = W = 48
    for k in keys[:16]:
        y0, x0, h, w = augment.sample_distorted_box(
            k, H, W, aspect_ratio_range=(0.75, 1.333), area_range=(0.08, 1.0)
        )
        y0, x0, h, w = map(float, (y0, x0, h, w))
        assert 0 <= y0 and y0 + h <= H + 1e-3
        assert 0 <= x0 and x0 + w <= W + 1e-3
        assert h * w >= 0.1 * H * W - 1e-3  # min_object_covered


def test_color_jitter_changes_image_within_range(rgb_batch):
    out = augment.color_jitter(jnp.asarray(rgb_batch), jax.random.PRNGKey(0), strength=1.0)
    assert out.shape == rgb_batch.shape
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    assert not np.allclose(np.asarray(out), rgb_batch)


def test_batched_random_apply_statistics():
    imgs = jnp.zeros((512, 2, 2, 3))
    out = augment.batched_random_apply(lambda x, k: x + 1.0, 0.25, imgs, jax.random.PRNGKey(0))
    frac = float(jnp.mean(out[:, 0, 0, 0]))
    assert 0.15 < frac < 0.35


def test_two_view_pretrain_batch():
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 3))
    out = augment.two_view_pretrain_batch(imgs, jax.random.PRNGKey(1), 32, 32,
                                          color_jitter_strength=0.5, use_blur=True)
    assert out.shape == (8, 32, 32, 3)
    # Views must differ (stochastic augmentation).
    assert not np.allclose(np.asarray(out[:4]), np.asarray(out[4:]))


def test_preprocess_eval_deterministic():
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, 40, 40, 3))
    a = augment.preprocess_for_eval(imgs, 32, 32)
    b = augment.preprocess_for_eval(imgs, 32, 32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert a.shape == (2, 32, 32, 3)
