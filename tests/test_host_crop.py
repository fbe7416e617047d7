"""Full-resolution host crop path (--host_crop_full_res, VERDICT r2 #2).

The loader samples the distorted box AND resamples pixels at ORIGINAL
source resolution (reference data_util.py:252-325), so large-photo crops
keep full detail instead of the <=256px letterbox canvas's; the device
stage then applies flip/color/blur only (ops/augment.py
two_view_pretrain_batch(host_cropped=True))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from simclr_tpu.data.loader import make_train_crop_fn


def _test_image(h=512, w=768):
    """High-frequency content so resampling fidelity is observable."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        127.5 + 127.5 * np.sin(xx * 0.9) * np.cos(yy * 0.7),
        127.5 + 127.5 * np.sin((xx + yy) * 0.45),
        (xx * 255 / w + yy * 255 / h) / 2,
    ], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_crop_fn_matches_reference_pipeline_at_full_res():
    """The map output must equal the reference pipeline computed directly:
    stateless_sample_distorted_bounding_box at ORIGINAL resolution ->
    crop -> bicubic resize (data_util.py:252-325 with the reference's
    sampling parameters)."""
    img = _test_image()
    fn = make_train_crop_fn(224, 224, num_views=2, seed=11)
    out = fn(tf.constant(img), tf.constant(5, tf.int64)).numpy()
    assert out.shape == (2, 224, 224, 3) and out.dtype == np.uint8
    # The two views are distinct crops.
    assert np.abs(out[0].astype(int) - out[1].astype(int)).mean() > 1.0

    for v in range(2):
        begin, size, _ = tf.image.stateless_sample_distorted_bounding_box(
            tf.shape(tf.constant(img)),
            bounding_boxes=tf.zeros((1, 0, 4), tf.float32),
            seed=[11 + v, 5],
            min_object_covered=0.1,
            aspect_ratio_range=(0.75, 4.0 / 3.0),
            area_range=(0.08, 1.0),
            max_attempts=100,
            use_image_if_no_bounding_boxes=True)
        crop = tf.slice(tf.constant(img), begin, size)
        ref = tf.cast(tf.clip_by_value(tf.cast(tf.image.resize(
            crop, (224, 224), method="bicubic"), tf.float32), 0, 255), tf.uint8)
        np.testing.assert_array_equal(out[v], ref.numpy())
        # Sanity: boxes are sampled on the ORIGINAL 512x768 grid (a 256
        # canvas could never yield a >256px-wide box).
        assert int(size[0]) <= 512 and int(size[1]) <= 768


def test_crop_fn_is_deterministic_per_example_index():
    img = _test_image(300, 300)
    fn = make_train_crop_fn(96, 96, num_views=2, seed=3)
    a = fn(tf.constant(img), tf.constant(7, tf.int64)).numpy()
    b = fn(tf.constant(img), tf.constant(7, tf.int64)).numpy()
    c = fn(tf.constant(img), tf.constant(8, tf.int64)).numpy()
    np.testing.assert_array_equal(a, b)
    assert np.abs(a.astype(int) - c.astype(int)).mean() > 1.0


def test_host_crop_retains_more_detail_than_canvas():
    """An ~8%-area crop of a large photo from the full-res host path must
    be closer to the true full-res resample than the same crop taken from
    a 256px letterbox canvas (the r2 fidelity delta, VERDICT #4/#2)."""
    from simclr_tpu.ops.augment import resize_bicubic

    img = _test_image(512, 512)
    # A fixed ~8%-area box at original resolution.
    y0, x0, ch, cw = 100, 150, 145, 145
    truth = tf.image.resize(img[y0:y0 + ch, x0:x0 + cw].astype(np.float32),
                            (224, 224), method="bicubic").numpy() / 255.0

    # Canvas path: 512 -> 256 letterbox, then crop the scaled box + resize.
    canvas = tf.image.resize(img.astype(np.float32), (256, 256),
                             method="bicubic").numpy()
    cy0, cx0, cch, ccw = y0 // 2, x0 // 2, ch // 2, cw // 2
    canvas_crop = np.asarray(resize_bicubic(
        jnp.asarray(canvas[None, cy0:cy0 + cch, cx0:cx0 + ccw] / 255.0),
        224, 224))[0]

    # Host full-res path: crop at original resolution + resize (what
    # make_train_crop_fn does for the sampled box).
    host_crop = tf.image.resize(
        img[y0:y0 + ch, x0:x0 + cw].astype(np.float32), (224, 224),
        method="bicubic").numpy() / 255.0

    err_host = np.abs(host_crop - truth).mean()
    err_canvas = np.abs(np.clip(canvas_crop, 0, 1) - truth).mean()
    assert err_host < 1e-6, err_host  # identical pipeline
    assert err_canvas > 20 * max(err_host, 1e-4), (err_canvas, err_host)


def test_two_view_host_cropped_xla_pallas_agree():
    """Device stage on host crops: identity-resample fused kernel (flip +
    jitter + gray in one pass) must match the explicit XLA path."""
    from simclr_tpu.ops import augment

    rng = np.random.RandomState(0)
    crops = rng.randint(0, 256, (3, 2, 64, 64, 3), np.uint8)
    key = jax.random.PRNGKey(4)
    out_x = augment.two_view_pretrain_batch(
        jnp.asarray(crops), key, 64, 64, color_jitter_strength=0.7,
        use_blur=False, color_impl="xla", host_cropped=True)
    out_p = augment.two_view_pretrain_batch(
        jnp.asarray(crops), key, 64, 64, color_jitter_strength=0.7,
        use_blur=False, color_impl="pallas_interpret", host_cropped=True)
    assert out_x.shape == (6, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p), atol=6e-3)


def test_host_cropped_flips_match_device_path_draws():
    """host_cropped=True must draw the SAME flips as the device-crop path
    for a given key (k_crop split and discarded): with jitter/blur off and
    an identity 'crop' source, the output equals flip-only."""
    from simclr_tpu.ops import augment

    rng = np.random.RandomState(1)
    imgs = rng.rand(4, 32, 32, 3).astype(np.float32)
    crops = np.stack([imgs, imgs], axis=1)  # both views = the image itself
    key = jax.random.PRNGKey(9)
    out = augment.two_view_pretrain_batch(
        jnp.asarray(crops), key, 32, 32, color_jitter_strength=0.0,
        use_blur=False, color_impl="xla", host_cropped=True)
    # Reproduce the expected flips with the step's split contract.
    k1, k2, _ = jax.random.split(key, 3)
    for i, k in enumerate((k1, k2)):
        _, k_flip, _ = jax.random.split(k, 3)
        flips = np.asarray(jax.random.bernoulli(k_flip, 0.5, (4,)))
        expect = np.where(flips[:, None, None, None], imgs[:, :, ::-1, :], imgs)
        np.testing.assert_allclose(np.asarray(out[i * 4:(i + 1) * 4]), expect,
                                   atol=1e-6)


def test_host_cropped_train_step_runs():
    """End-to-end: the GSPMD step consumes (B, 2, H, W, 3) host-crop
    batches and trains."""
    from simclr_tpu.config import Config
    from simclr_tpu.training import steps as steps_lib
    from simclr_tpu.training.state import TrainState
    from simclr_tpu.training.trainer import build_model_and_optimizer

    cfg = Config(resnet_depth=18, image_size=32, train_batch_size=4,
                 train_mode="pretrain", use_blur=False, warmup_epochs=0,
                 compute_dtype="float32", use_fused_ntxent="false")
    model, tx, lr_fn = build_model_and_optimizer(cfg, num_examples=64,
                                                 num_classes=4)
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.concatenate([x, x]),
                           train=True)
    state = TrainState(step=jnp.zeros([], jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step = steps_lib.make_train_step(cfg, model, tx, lr_fn, host_cropped=True)
    rng = np.random.RandomState(2)
    batch = {"image": jnp.asarray(
                 rng.randint(0, 256, (4, 2, 32, 32, 3), np.uint8)),
             "label": jnp.arange(4, dtype=jnp.int32)}
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["train/total_loss"]))
