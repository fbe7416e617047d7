"""--device_augment=false (host-CPU augmentation pipeline), --eval_name
namespacing, and the augmented-view image summary (VERDICT r2 items #4/#7,
reference run.py:140-142 / tf2/run.py:572-576)."""

import os

import jax
import numpy as np
import pytest

from simclr_tpu.config import Config
from simclr_tpu.training import trainer


def _tiny_config(tmp_path, name, **kw):
    base = dict(
        dataset="synthetic",
        num_images_default=64,
        image_size=32,
        resnet_depth=18,
        train_batch_size=16,
        eval_batch_size=16,
        train_steps=2,
        checkpoint_steps=2,
        eval_steps=2,
        train_summary_steps=1,
        warmup_epochs=0,
        optimizer="lars",
        learning_rate=0.1,
        model_dir=str(tmp_path / name),
        compute_dtype="float32",
        use_blur=False,
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.slow
def test_host_augment_matches_device_augment(tmp_path):
    """A --device_augment=false run draws the same crops/jitters as the
    on-device default (same key schedule, same XLA augment functions on
    this CPU backend), so the trained parameters must agree."""
    dev = _tiny_config(tmp_path, "dev", device_augment=True)
    host = _tiny_config(tmp_path, "host", device_augment=False)

    s_dev = trainer.train(dev)
    s_host = trainer.train(host)

    flat_d = jax.tree.leaves(jax.device_get(s_dev.params))
    flat_h = jax.tree.leaves(jax.device_get(s_host.params))
    assert len(flat_d) == len(flat_h)
    for a, b in zip(flat_d, flat_h):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_host_augment_rejects_shard_map(tmp_path):
    cfg = _tiny_config(tmp_path, "sm", device_augment=False,
                       use_shard_map=True)
    with pytest.raises(ValueError, match="device_augment"):
        trainer.train(cfg)


def test_host_augment_pipeline_shapes():
    """Unit: the pipeline yields pre-augmented float (2B,H,W,3) pretrain
    views with the step's key schedule (data/host_augment.py)."""
    from simclr_tpu.data.host_augment import HostAugmentPipeline
    from simclr_tpu.ops import augment

    cfg = Config(image_size=32, train_mode="pretrain", use_blur=False,
                 color_jitter_strength=0.5)
    rng = np.random.RandomState(0)
    batches = [{"image": rng.randint(0, 256, (4, 48, 48, 3), np.uint8),
                "label": np.arange(4, dtype=np.int32)}]
    pipe = HostAugmentPipeline(iter(batches), cfg, jax.random.PRNGKey(7))
    out = next(iter(pipe))
    assert out["image"].shape == (8, 32, 32, 3)
    assert out["image"].dtype == np.float32
    assert out["image"].min() >= 0.0 and out["image"].max() <= 1.0
    # Exactly the draws the on-device step would make at step 0.
    k_aug = jax.random.fold_in(jax.random.fold_in(jax.random.PRNGKey(7), 0), 0)
    ref = augment.two_view_pretrain_batch(
        batches[0]["image"], k_aug, 32, 32, color_jitter_strength=0.5,
        use_blur=False, color_impl="xla")
    np.testing.assert_allclose(out["image"], np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_eval_name_namespaces_summary_dir(tmp_path):
    """--eval_name=foo writes eval summaries under model_dir/eval_foo
    (estimator.evaluate(name=...) semantics, reference run.py:326-327)."""
    cfg = _tiny_config(tmp_path, "m")
    trainer.train(cfg)
    trainer.evaluate(cfg.replace(eval_name="holdout"))
    named = os.path.join(cfg.model_dir, "eval_holdout")
    assert os.path.isdir(named)
    assert os.listdir(named)  # events file or metrics.jsonl
    trainer.evaluate(cfg)  # no name -> plain eval/
    assert os.path.isdir(os.path.join(cfg.model_dir, "eval"))


def test_view_summary_metric_shape():
    """The train step exports a small slice of the actual augmented model
    inputs for TB image summaries (tf2/run.py:572-576; VERDICT r2 #7)."""
    import jax.numpy as jnp
    import optax

    from simclr_tpu.training import steps as steps_lib
    from simclr_tpu.training.state import TrainState
    from simclr_tpu.training.trainer import build_model_and_optimizer

    cfg = Config(resnet_depth=18, image_size=32, train_batch_size=4,
                 train_mode="pretrain", use_blur=False, warmup_epochs=0,
                 compute_dtype="float32", use_fused_ntxent="false")
    model, tx, lr_fn = build_model_and_optimizer(cfg, num_examples=64,
                                                 num_classes=4)
    x = jnp.zeros((4, 32, 32, 3), jnp.uint8)
    variables = model.init(jax.random.PRNGKey(0), x.astype(jnp.float32), train=True)
    state = TrainState(step=jnp.zeros([], jnp.int32), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step = steps_lib.make_train_step(cfg, model, tx, lr_fn)
    batch = {"image": x, "label": jnp.arange(4, dtype=jnp.int32)}
    _, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    views = metrics[steps_lib.VIEW_SUMMARY_KEY]
    # Both views of the first n images: (2n, H, W, 3) float in [0,1].
    assert views.shape == (6, 32, 32, 3)
    assert views.dtype == jnp.float32
