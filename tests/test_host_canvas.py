"""Host canvas <-> device crop composition for variable-size sources
(VERDICT round-1 item 3 / weak 3).

The train path letterboxes the original image onto the fixed canvas aspect-
preserved and hands the device sampler the valid region; the effective
crop-geometry distribution must match tf.image.sample_distorted_bounding_box
on the ORIGINAL image (reference data_util.py:252-325).  The eval path runs
the reference center crop on the host at original resolution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from simclr_tpu.data.loader import make_eval_crop_fn, make_train_canvas_fn
from simclr_tpu.ops import augment


def _rand_image(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


def test_train_canvas_preserves_aspect_and_reports_valid_region():
    img = _rand_image(200, 320)
    canvas, valid_hw = make_train_canvas_fn(256, 256)(tf.constant(img))
    canvas, valid_hw = canvas.numpy(), valid_hw.numpy()
    assert canvas.shape == (256, 256, 3)
    np.testing.assert_array_equal(valid_hw, [160, 256])  # scale 0.8, no squash
    # content is the aspect-preserving bicubic fit; padding edge-replicates
    # the last valid row (clamp semantics for boundary bicubic taps)
    ref = tf.image.resize(img, (160, 256), method="bicubic")
    ref = tf.cast(tf.clip_by_value(ref, 0, 255), tf.uint8).numpy()
    np.testing.assert_array_equal(canvas[:160], ref)
    np.testing.assert_array_equal(canvas[160:], np.broadcast_to(ref[159], (96, 256, 3)))


def test_train_canvas_never_upscales_small_images():
    img = _rand_image(100, 150, seed=1)
    canvas, valid_hw = make_train_canvas_fn(256, 256)(tf.constant(img))
    np.testing.assert_array_equal(valid_hw.numpy(), [100, 150])
    np.testing.assert_array_equal(canvas.numpy()[:100, :150], img)
    # padding replicates the edge pixels
    np.testing.assert_array_equal(canvas.numpy()[:100, 150],
                                  canvas.numpy()[:100, 149])


def test_crop_geometry_distribution_matches_tf_sampler():
    """Sample many distorted boxes through our valid-region sampler and map
    them back to original-image coordinates; their aspect/area statistics
    must match tf.image.sample_distorted_bounding_box on the original."""
    oh, ow = 300, 480  # original image dims (1.6:1)
    scale = min(256 / oh, 256 / ow)  # = 8/15 -> valid (160, 256)
    vh, vw = round(oh * scale), round(ow * scale)
    n = 2000

    keys = jax.random.split(jax.random.PRNGKey(0), n)
    sample = jax.jit(jax.vmap(lambda k: augment.sample_distorted_box(
        k, vh, vw, aspect_ratio_range=(3.0 / 4, 4.0 / 3),
        area_range=(0.08, 1.0), min_object_covered=0.1)))
    y0, x0, h, w = map(np.asarray, sample(keys))
    # back to original coordinates
    h_o, w_o = h / scale, w / scale
    ours_logar = np.log((w_o / h_o))
    ours_area = (h_o * w_o) / (oh * ow)
    assert (y0 >= 0).all() and (x0 >= 0).all()
    assert ((y0 + h) <= vh + 1e-3).all() and ((x0 + w) <= vw + 1e-3).all()

    bbox = tf.constant([[[0.0, 0.0, 1.0, 1.0]]])
    tf_logar, tf_area = [], []
    for seed in range(n):
        begin, size, _ = tf.image.stateless_sample_distorted_bounding_box(
            tf.constant([oh, ow, 3]), bbox, seed=(seed, 1),
            min_object_covered=0.1, aspect_ratio_range=(3.0 / 4, 4.0 / 3),
            area_range=(0.08, 1.0), max_attempts=100)
        size = size.numpy()
        tf_logar.append(np.log(size[1] / size[0]))
        tf_area.append(size[0] * size[1] / (oh * ow))
    tf_logar, tf_area = np.array(tf_logar), np.array(tf_area)

    # Distribution-level agreement (means/stds within a few percent of the
    # support width).
    assert abs(ours_logar.mean() - tf_logar.mean()) < 0.05, (ours_logar.mean(), tf_logar.mean())
    assert abs(ours_logar.std() - tf_logar.std()) < 0.05
    assert abs(ours_area.mean() - tf_area.mean()) < 0.05, (ours_area.mean(), tf_area.mean())
    assert abs(ours_area.std() - tf_area.std()) < 0.05
    # aspect bounds hold in ORIGINAL pixel space
    ar = w_o / h_o
    assert (ar >= 3.0 / 4 - 0.02).all() and (ar <= 4.0 / 3 + 0.02).all()
    assert (ours_area >= 0.08 - 0.01).all()


def test_eval_host_crop_matches_reference_center_crop():
    """Host eval crop at original resolution == the (TF-oracle-tested)
    device center_crop applied to the original image."""
    img = _rand_image(300, 480, seed=2)
    out = make_eval_crop_fn(224, 224, test_crop=True)(tf.constant(img)).numpy()
    ref = augment.center_crop(
        jnp.asarray(img[None], jnp.float32) / 255.0, 224, 224)
    ref = np.asarray(jnp.clip(jnp.round(ref * 255.0), 0, 255)).astype(np.uint8)[0]
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert (diff <= 2).mean() > 0.99, diff.mean()  # bicubic impl rounding


def test_eval_host_crop_no_test_crop_resizes_only():
    img = _rand_image(32, 32, seed=3)
    out = make_eval_crop_fn(32, 32, test_crop=False)(tf.constant(img)).numpy()
    np.testing.assert_array_equal(out, img)


def test_device_crop_with_valid_hw_never_samples_padding():
    """Canvas = 0.5 inside the valid region, 0 in the padding; every crop
    must be ~0.5 everywhere (the sampler stays inside the valid region)."""
    b, canvas = 8, 64
    images = np.zeros((b, canvas, canvas, 3), np.float32)
    images[:, :40, :64] = 0.5
    valid_hw = np.tile(np.array([[40, 64]], np.int32), (b, 1))
    out = augment.preprocess_for_train(
        jnp.asarray(images), jax.random.PRNGKey(0), 32, 32,
        color_jitter_strength=0.0, flip=False,
        valid_hw=jnp.asarray(valid_hw))
    out = np.asarray(out)
    assert out.min() > 0.45, out.min()  # bicubic ring tolerance
    assert abs(out.mean() - 0.5) < 0.01
