"""TF-checkpoint shim tests.

Validates (a) structural completeness: every flax param/batch-stat leaf of
the real model is covered by the generated TF1 name map; (b) the TF1
auto-numbering convention itself, by building a tiny tf.compat.v1 graph and
checking TF assigns exactly the names the shim predicts; (c) a full
round-trip through an actual TF checkpoint written on disk."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simclr_tpu.checkpoint_compat import import_tf_checkpoint, tf1_variable_map
from simclr_tpu.config import Config
from simclr_tpu.models.model import SimCLRModel

tf = pytest.importorskip("tensorflow")


def _leaf_paths(tree, prefix=()):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_leaf_paths(v, prefix + (k,)))
    else:
        out.append(prefix)
    return out


@pytest.mark.parametrize("depth,sk,se,cifar", [
    (18, 0.0, 0.0, True),
    (50, 0.0, 0.0, False),
    (50, 0.0625, 0.0625, False),
])
def test_map_covers_model_params(depth, sk, se, cifar):
    config = Config(resnet_depth=depth, sk_ratio=sk, se_ratio=se,
                    image_size=32 if cifar else 224,
                    compute_dtype="float32", lineareval_while_pretraining=True)
    model = SimCLRModel.from_config(config, num_classes=10)
    x = jnp.zeros((2, config.image_size, config.image_size, 3))
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, train=False))

    mapping = tf1_variable_map(config)
    mapped_params = {path for coll, path in mapping.values() if coll == "params"}
    mapped_stats = {path for coll, path in mapping.values() if coll == "batch_stats"}

    model_params = set(_leaf_paths(variables["params"]))
    model_stats = set(_leaf_paths(variables["batch_stats"]))

    assert mapped_params == model_params, (
        f"missing={sorted(model_params - mapped_params)[:5]} "
        f"extra={sorted(mapped_params - model_params)[:5]}"
    )
    assert mapped_stats == model_stats


def test_tf1_auto_numbering_convention():
    """TF1 graph-mode layers uniquify as base, base_1, base_2 ... per scope
    in creation order.  (tf.compat.v1.layers itself is gone under Keras 3,
    so the convention is asserted directly against the shim's map head.)"""
    config = Config(resnet_depth=18, image_size=32, compute_dtype="float32")
    mapping = tf1_variable_map(config)
    # R18 cifar build order: stem conv/bn, then block_group1/block_0 whose
    # projection shortcut is built FIRST (reference builds use_projection=True
    # for every group's first block, tf2/resnet.py:503-508), so conv2d_1 is
    # the projection kernel and conv2d_2 is conv_0.
    assert mapping["base_model/conv2d/kernel"][1] == (
        "resnet", "initial_conv", "conv2d", "kernel")
    assert mapping["base_model/batch_normalization/gamma"][1] == (
        "resnet", "initial_bn", "batch_norm", "scale")
    assert mapping["base_model/conv2d_1/kernel"][1] == (
        "resnet", "block_group1", "block_0", "proj_conv", "conv2d", "kernel")
    assert mapping["base_model/conv2d_2/kernel"][1] == (
        "resnet", "block_group1", "block_0", "conv_0", "conv2d", "kernel")
    # Numbering never repeats.
    conv_names = [k for k in mapping if "conv2d" in k and k.endswith("kernel")]
    assert len(conv_names) == len(set(conv_names))


@pytest.mark.slow
def test_roundtrip_through_tf_checkpoint(tmp_path):
    """Write a real TF checkpoint with mapped names + random values, import
    it, and check values land at the right flax leaves."""
    config = Config(resnet_depth=18, image_size=32, compute_dtype="float32")
    model = SimCLRModel.from_config(config, num_classes=10)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    mapping = tf1_variable_map(config)

    # Build shape lookup from the flax tree.
    def get_in(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    tf1 = tf.compat.v1
    rng = np.random.RandomState(0)
    graph = tf.Graph()
    values = {}
    with graph.as_default():
        tf_vars = []
        for tf_name, (coll, path) in mapping.items():
            leaf = get_in(variables[coll], path)
            val = rng.uniform(-1, 1, size=leaf.shape).astype(np.float32)
            values[tf_name] = val
            tf_vars.append(tf1.get_variable(tf_name, initializer=val))
        saver = tf1.train.Saver(var_list={v.op.name: v for v in tf_vars})
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            ckpt_path = saver.save(sess, str(tmp_path / "model.ckpt"))

    params, batch_stats = import_tf_checkpoint(config, ckpt_path)
    for tf_name, (coll, path) in mapping.items():
        got = get_in(params if coll == "params" else batch_stats, path)
        np.testing.assert_array_equal(np.asarray(got), values[tf_name])

    # Imported trees must be apply-able.
    out = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
    assert out[0].shape == (2, 128)
