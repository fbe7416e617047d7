"""StableHLO serving artifact (jax.export) — the TPU-native sibling of the
reference's SavedModel export (tf2/run.py:241-305).

The artifact must rehydrate WITHOUT the model code (pure deserialized IR +
the bundle's variables) and match the live JAX serving callable exactly,
at any batch size (symbolic batch dim)."""

import numpy as np
import jax
import jax.numpy as jnp

from simclr_tpu.config import Config


def test_stablehlo_export_matches_jax_serving(tmp_path):
    from simclr_tpu.export import (export_serving, export_stablehlo,
                                   load_serving, load_stablehlo)
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
    artifact = export_stablehlo(bundle, platforms=("cpu",))

    serve_ir = load_stablehlo(bundle)
    serve = load_serving(bundle)

    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out_ir = serve_ir(imgs)
    out = serve(imgs, trainable=False)
    assert set(out_ir.keys()) == set(out.keys())
    for key in ("default", "final_avg_pool", "proj_head_output", "logits_sup"):
        np.testing.assert_allclose(np.asarray(out_ir[key]), np.asarray(out[key]),
                                   atol=1e-6, err_msg=key)

    # Symbolic batch: the SAME artifact serves other batch sizes.
    out5 = serve_ir(jnp.concatenate([imgs, imgs, imgs[:1]], axis=0))
    assert out5["default"].shape == (5, 512)

    # The artifact is compact IR (variables stay in the bundle's Orbax
    # tree), not a weights dump.
    import os

    n_params = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(variables))
    assert 1000 < os.path.getsize(artifact) < n_params  # << 4 bytes/param
