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


# ---------------------------------------------------------------------------
# TF2 object-path naming (tf2/run.py:308-337)
# ---------------------------------------------------------------------------

from simclr_tpu.checkpoint_compat import (  # noqa: E402
    detect_tf_naming, resolve_tf_checkpoint, tf2_variable_map,
)


@pytest.mark.parametrize("depth,sk,se,cifar", [
    (18, 0.0, 0.0, True),
    (50, 0.0, 0.0, False),
    (50, 0.0625, 0.0625, False),
])
def test_tf2_map_covers_model_params(depth, sk, se, cifar):
    config = Config(resnet_depth=depth, sk_ratio=sk, se_ratio=se,
                    image_size=32 if cifar else 224,
                    compute_dtype="float32", lineareval_while_pretraining=True)
    model = SimCLRModel.from_config(config, num_classes=10)
    x = jnp.zeros((2, config.image_size, config.image_size, 3))
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, train=False))

    mapping = tf2_variable_map(config)
    mapped_params = {path for coll, path in mapping.values() if coll == "params"}
    mapped_stats = {path for coll, path in mapping.values() if coll == "batch_stats"}
    model_params = set(_leaf_paths(variables["params"]))
    model_stats = set(_leaf_paths(variables["batch_stats"]))
    assert mapped_params == model_params, (
        f"missing={sorted(model_params - mapped_params)[:5]} "
        f"extra={sorted(mapped_params - model_params)[:5]}")
    assert mapped_stats == model_stats


def test_tf2_object_path_convention():
    """Spot-check the object-path grammar against the keras attribute graph
    read from tf2/resnet.py:529-699 / tf2/model.py:157-233."""
    config = Config(resnet_depth=50, image_size=224, compute_dtype="float32")
    mapping = tf2_variable_map(config)
    sfx = "/.ATTRIBUTES/VARIABLE_VALUE"
    assert mapping[f"model/resnet_model/initial_conv_relu_max_pool/0/conv2d/kernel{sfx}"][1] == (
        "resnet", "initial_conv", "conv2d", "kernel")
    assert mapping[f"model/resnet_model/initial_conv_relu_max_pool/2/bn/moving_mean{sfx}"] == (
        "batch_stats", ("resnet", "initial_bn", "batch_norm", "mean"))
    # bottleneck block 0 of group 2: projection at projection_layers/0
    assert mapping[f"model/resnet_model/block_groups/1/layers/0/projection_layers/0/conv2d/kernel{sfx}"][1] == (
        "resnet", "block_group2", "block_0", "proj_conv", "conv2d", "kernel")
    # DropBlock occupies index 2 -> second conv at index 3
    assert mapping[f"model/resnet_model/block_groups/0/layers/1/conv_relu_dropblock_layers/3/conv2d/kernel{sfx}"][1] == (
        "resnet", "block_group1", "block_1", "conv_1", "conv2d", "kernel")
    assert mapping[f"model/_projection_head/linear_layers/1/dense/kernel{sfx}"][1] == (
        "projection_head", "nl_1", "dense", "kernel")
    assert mapping[f"model/supervised_head/linear_layer/dense/bias{sfx}"][1] == (
        "head_supervised", "linear_layer", "dense", "bias")
    # middle proj layers keep beta; the final one is centerless (use_bias=False)
    assert f"model/_projection_head/linear_layers/0/bn_relu/bn/beta{sfx}" in mapping
    assert f"model/_projection_head/linear_layers/2/bn_relu/bn/beta{sfx}" not in mapping


def test_detect_tf_naming():
    assert detect_tf_naming({"base_model/conv2d/kernel": None}) == "tf1"
    assert detect_tf_naming(
        {"model/resnet_model/x/.ATTRIBUTES/VARIABLE_VALUE": None}) == "tf2"


def _write_tf2_style_checkpoint(tmp_path, config, variables, mapping, rng):
    """Write a real TF checkpoint whose keys are the TF2 object paths (the
    var_list-dict form of Saver writes arbitrary checkpoint keys)."""
    def get_in(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    tf1 = tf.compat.v1
    graph = tf.Graph()
    values = {}
    with graph.as_default():
        var_list = {}
        for i, (key, (coll, path)) in enumerate(mapping.items()):
            leaf = get_in(variables[coll], path)
            val = rng.uniform(-1, 1, size=leaf.shape).astype(np.float32)
            values[key] = val
            var_list[key] = tf1.get_variable(f"v_{i}", initializer=val)
        saver = tf1.train.Saver(var_list=var_list)
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            ckpt_path = saver.save(sess, str(tmp_path / "tf2_style.ckpt"))
    return ckpt_path, values


@pytest.mark.slow
def test_tf2_roundtrip_through_tf_checkpoint(tmp_path):
    config = Config(resnet_depth=18, image_size=32, compute_dtype="float32")
    model = SimCLRModel.from_config(config, num_classes=10)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    mapping = tf2_variable_map(config)
    ckpt_path, values = _write_tf2_style_checkpoint(
        tmp_path, config, variables, mapping, np.random.RandomState(1))

    def get_in(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    params, batch_stats = import_tf_checkpoint(config, ckpt_path)  # auto-detects tf2
    for key, (coll, path) in mapping.items():
        got = get_in(params if coll == "params" else batch_stats, path)
        np.testing.assert_array_equal(np.asarray(got), values[key])
    out = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
    assert out[0].shape == (2, 128)


@pytest.mark.slow
def test_warm_start_accepts_tf_checkpoint(tmp_path):
    """--checkpoint pointed at a TF checkpoint goes through the compat shim
    with variable_schema + zero-init surgery applied."""
    from simclr_tpu.optim.builder import masked, trainable_mask
    from simclr_tpu.parallel import mesh as mesh_lib
    from simclr_tpu.training import checkpoint as ckpt_lib, trainer

    config = Config(resnet_depth=18, image_size=32, compute_dtype="float32",
                    dataset="synthetic", train_batch_size=8, warmup_epochs=0,
                    zero_init_logits_layer=True)
    model = SimCLRModel.from_config(config, num_classes=10)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    mapping = tf2_variable_map(config)
    ckpt_path, values = _write_tf2_style_checkpoint(
        tmp_path, config, variables, mapping, np.random.RandomState(2))
    assert resolve_tf_checkpoint(ckpt_path) == ckpt_path
    assert resolve_tf_checkpoint(str(tmp_path)) == ckpt_path

    mesh = mesh_lib.create_mesh(config)
    _, tx, _ = trainer.build_model_and_optimizer(config, 64, 10)
    state = trainer.init_state(config, model, tx, mesh, (32, 32, 3))
    restored = ckpt_lib.warm_start(config, state, str(tmp_path))
    # encoder weights came from the TF checkpoint...
    sfx = "/.ATTRIBUTES/VARIABLE_VALUE"
    stem = np.asarray(restored.params["resnet"]["initial_conv"]["conv2d"]["kernel"])
    np.testing.assert_array_equal(
        stem, values[f"model/resnet_model/initial_conv_relu_max_pool/0/conv2d/kernel{sfx}"])
    # ...and the supervised head was zero-initialized
    head = np.asarray(restored.params["head_supervised"]["linear_layer"]["dense"]["kernel"])
    assert (head == 0).all()


# ---------------------------------------------------------------------------
# JAX -> TF export (the reverse direction: reference tooling consumes OUR
# checkpoints)
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("naming", ["tf1", "tf2"])
def test_export_tf_checkpoint_roundtrip(tmp_path, naming):
    """export_tf_checkpoint writes a TF checkpoint the import shim (oracle-
    tested against reference-structure fixtures) reads back bit-identical,
    under both released naming schemes."""
    from simclr_tpu.checkpoint_compat import export_tf_checkpoint

    config = Config(resnet_depth=18, image_size=32, compute_dtype="float32")
    model = SimCLRModel.from_config(config, num_classes=10)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(3), x, train=False)

    prefix = export_tf_checkpoint(
        config, variables["params"], variables["batch_stats"],
        str(tmp_path / f"export_{naming}.ckpt"), naming=naming)
    assert resolve_tf_checkpoint(prefix) == prefix

    # The written keys are exactly the scheme's variable names.
    from simclr_tpu.checkpoint_compat import (detect_tf_naming,
                                              load_tf_checkpoint)
    tf_vars = load_tf_checkpoint(prefix)
    assert detect_tf_naming(tf_vars) == naming

    params, batch_stats = import_tf_checkpoint(config, prefix)
    mapping = (tf2_variable_map(config) if naming == "tf2"
               else tf1_variable_map(config))

    def get_in(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    for _, (coll, path) in mapping.items():
        src = get_in(variables[coll], path)
        dst = get_in(params if coll == "params" else batch_stats, path)
        np.testing.assert_array_equal(np.asarray(src), np.asarray(dst))


def test_export_tf_checkpoint_strict_missing(tmp_path):
    from simclr_tpu.checkpoint_compat import export_tf_checkpoint

    config = Config(resnet_depth=18, image_size=32, compute_dtype="float32")
    with pytest.raises(KeyError):
        export_tf_checkpoint(config, {}, {}, str(tmp_path / "x.ckpt"))


def test_rescale_encoder_conv_kernels():
    """README.md:198 known-issue shim: v1-vs-v2 weight-norm scale — only
    4-D conv kernels inside the encoder subtree are rescaled."""
    from simclr_tpu.checkpoint_compat import rescale_encoder_conv_kernels

    params = {
        "resnet": {
            "initial_conv": {"conv2d": {"kernel": np.ones((3, 3, 3, 8), np.float32)}},
            "bn": {"scale": np.ones((8,), np.float32)},
        },
        "projection_head": {"dense": {"kernel": np.ones((8, 4), np.float32)}},
        "head_supervised": {"kernel": np.ones((8, 10), np.float32)},
    }
    out = rescale_encoder_conv_kernels(params, 1.0 / 16.8)
    np.testing.assert_allclose(
        out["resnet"]["initial_conv"]["conv2d"]["kernel"],
        np.full((3, 3, 3, 8), 1.0 / 16.8, np.float32), rtol=1e-6)
    # BN / dense / head untouched; input tree unmodified.
    np.testing.assert_array_equal(out["resnet"]["bn"]["scale"], 1.0)
    np.testing.assert_array_equal(out["projection_head"]["dense"]["kernel"], 1.0)
    np.testing.assert_array_equal(out["head_supervised"]["kernel"], 1.0)
    np.testing.assert_array_equal(
        params["resnet"]["initial_conv"]["conv2d"]["kernel"], 1.0)
    # Wrongly-rooted tree (e.g. the full variables dict) must fail loudly
    # instead of silently skipping the rescale the caller asked for
    # (ADVICE r3).
    with pytest.raises(ValueError, match="resnet"):
        rescale_encoder_conv_kernels({"params": params}, 2.0)
    # An encoder subtree with no 4-D conv kernels is equally suspect.
    with pytest.raises(ValueError, match="no 4-D conv kernels"):
        rescale_encoder_conv_kernels(
            {"resnet": {"bn": {"scale": np.ones((8,), np.float32)}}}, 2.0)
