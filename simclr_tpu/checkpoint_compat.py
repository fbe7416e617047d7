"""TF-checkpoint import shim (reference N11).

The released SimCLR checkpoints (reference README.md:35-44, 65 families)
use TF1 graph-mode auto-naming: ``base_model/conv2d_<i>/kernel``,
``base_model/batch_normalization_<i>/{gamma,beta,moving_mean,
moving_variance}`` (numbered in graph-build order inside the 'base_model'
scope, model.py:61), ``head_contrastive/nl_<j>/{dense,batch_normalization}``
(model_util.py:129-177) and ``head_supervised/linear_layer/dense``
(model_util.py:180-187).

This module reconstructs that naming by walking THIS framework's
architecture in the reference's graph-build order (stem -> per group ->
[projection, conv stack, SK mixing, SE] per block) and maps every TF name
to a flax param/batch_stats path, so released checkpoints load directly
into the JAX model.  Conv kernels are HWIO in both worlds; dense kernels
are (in, out) in both; BN gamma/beta -> scale/bias, moving stats ->
batch_stats.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from simclr_tpu.config import Config
from simclr_tpu.models.resnet import MODEL_PARAMS

Path = Tuple[str, ...]


class _TF1Namer:
    """Reproduces tf.layers auto-numbering within one variable scope."""

    def __init__(self):
        self.counts: Dict[str, int] = {}

    def next(self, base: str) -> str:
        n = self.counts.get(base, 0)
        self.counts[base] = n + 1
        return base if n == 0 else f"{base}_{n}"


def tf1_variable_map(config: Config) -> Dict[str, Tuple[str, Path]]:
    """Returns {tf1_var_name: (collection, flax_path)} where collection is
    'params' or 'batch_stats'.

    Walk order mirrors the TF1 graph build (resnet.py:565-679 + block fns at
    resnet.py:340-530): convs and BNs are interleaved exactly as called.
    """
    depth = config.resnet_depth
    block_type, layers = MODEL_PARAMS[depth]
    sk = config.sk_ratio > 0
    se = config.se_ratio > 0
    cifar = config.image_size <= 32

    namer = _TF1Namer()
    out: Dict[str, Tuple[str, Path]] = {}

    def add_conv(path_prefix: Path, use_bias: bool = False):
        name = namer.next("conv2d")
        out[f"base_model/{name}/kernel"] = ("params", path_prefix + ("kernel",))
        if use_bias:
            out[f"base_model/{name}/bias"] = ("params", path_prefix + ("bias",))

    def add_bn(path_prefix: Path, center: bool = True):
        name = namer.next("batch_normalization")
        out[f"base_model/{name}/gamma"] = ("params", path_prefix + ("scale",))
        if center:
            out[f"base_model/{name}/beta"] = ("params", path_prefix + ("bias",))
        out[f"base_model/{name}/moving_mean"] = ("batch_stats", path_prefix + ("mean",))
        out[f"base_model/{name}/moving_variance"] = ("batch_stats", path_prefix + ("var",))

    R = ("resnet",)

    # --- stem (resnet.py:565-597) ---
    if cifar:
        add_conv(R + ("initial_conv", "conv2d"))
        add_bn(R + ("initial_bn", "batch_norm"))
    elif sk:
        add_conv(R + ("initial_conv_0", "conv2d"))
        add_bn(R + ("initial_bn_0", "batch_norm"))
        add_conv(R + ("initial_conv_1", "conv2d"))
        add_bn(R + ("initial_bn_1", "batch_norm"))
        add_conv(R + ("initial_conv_2", "conv2d"))
        add_bn(R + ("initial_bn", "batch_norm"))
    else:
        add_conv(R + ("initial_conv", "conv2d"))
        add_bn(R + ("initial_bn", "batch_norm"))

    # --- block groups (resnet.py:626-664) ---
    for g in range(4):
        for b in range(layers[g]):
            B = R + (f"block_group{g + 1}", f"block_{b}")
            use_projection = b == 0
            if use_projection:
                add_conv(B + ("proj_conv", "conv2d"))
                add_bn(B + ("proj_bn", "batch_norm"))
            if block_type == "residual":
                add_conv(B + ("conv_0", "conv2d"))
                add_bn(B + ("bn_0", "batch_norm"))
                add_conv(B + ("conv_1", "conv2d"))
                add_bn(B + ("bn_1", "batch_norm"))
            else:
                add_conv(B + ("conv_0", "conv2d"))
                add_bn(B + ("bn_0", "batch_norm"))
                if sk:
                    S = B + ("sk_conv2d",)
                    add_conv(S + ("conv2d_fixed_padding", "conv2d"))
                    add_bn(S + ("batch_norm_relu", "batch_norm"))
                    add_conv(S + ("conv2d_0",), use_bias=False)
                    add_bn(S + ("batch_norm_relu_1", "batch_norm"))
                    add_conv(S + ("conv2d_1",), use_bias=False)
                else:
                    add_conv(B + ("conv_1", "conv2d"))
                    add_bn(B + ("bn_1", "batch_norm"))
                add_conv(B + ("conv_2", "conv2d"))
                add_bn(B + ("bn_2", "batch_norm"))
            if se:
                add_conv(B + ("se", "se_reduce"), use_bias=True)
                add_conv(B + ("se", "se_expand"), use_bias=True)

    # --- projection head (model_util.py:141-177) ---
    def add_head_bn(scope: str, path_prefix: Path, center: bool):
        out[f"{scope}/batch_normalization/gamma"] = ("params", path_prefix + ("scale",))
        if center:
            out[f"{scope}/batch_normalization/beta"] = ("params", path_prefix + ("bias",))
        out[f"{scope}/batch_normalization/moving_mean"] = ("batch_stats", path_prefix + ("mean",))
        out[f"{scope}/batch_normalization/moving_variance"] = ("batch_stats", path_prefix + ("var",))

    P = ("projection_head",)
    if config.proj_head_mode == "linear":
        out["head_contrastive/l_0/dense/kernel"] = ("params", P + ("l_0", "dense", "kernel"))
        add_head_bn("head_contrastive/l_0", P + ("l_0", "bn_relu", "batch_norm"), center=False)
    elif config.proj_head_mode == "nonlinear":
        for j in range(config.num_proj_layers):
            mid = j != config.num_proj_layers - 1
            nl = f"nl_{j}"
            out[f"head_contrastive/{nl}/dense/kernel"] = ("params", P + (nl, "dense", "kernel"))
            add_head_bn(f"head_contrastive/{nl}", P + (nl, "bn_relu", "batch_norm"), center=mid)

    # --- supervised head (model_util.py:180-187) ---
    H = ("head_supervised", "linear_layer")
    out["head_supervised/linear_layer/dense/kernel"] = ("params", H + ("dense", "kernel"))
    out["head_supervised/linear_layer/dense/bias"] = ("params", H + ("dense", "bias"))

    return out


def tf2_variable_map(config: Config) -> Dict[str, Tuple[str, Path]]:
    """Returns {tf2_checkpoint_key: (collection, flax_path)} for the TF2
    object-path naming (tf2/run.py:308-337 `tf.train.Checkpoint(model=model,
    ...)` over the keras object graph of tf2/model.py:228-280 +
    tf2/resnet.py:529-699).

    Keys look like
    ``model/resnet_model/block_groups/0/layers/1/conv2d_bn_layers/0/conv2d/
    kernel/.ATTRIBUTES/VARIABLE_VALUE`` — attribute names from the keras
    layer graph, list layers by index.  Variable-free layers (FixedPadding,
    pooling, Identity, DropBlock) occupy indices but contribute no keys.
    """
    depth = config.resnet_depth
    block_type, layers = MODEL_PARAMS[depth]
    sk = config.sk_ratio > 0
    se = config.se_ratio > 0
    cifar = config.image_size <= 32

    out: Dict[str, Tuple[str, Path]] = {}

    def vv(key: str) -> str:
        return f"model/{key}/.ATTRIBUTES/VARIABLE_VALUE"

    def add_conv(tf2_prefix: str, flax_prefix: Path, bias: bool = False):
        out[vv(f"{tf2_prefix}/kernel")] = ("params", flax_prefix + ("kernel",))
        if bias:
            out[vv(f"{tf2_prefix}/bias")] = ("params", flax_prefix + ("bias",))

    def add_bn(tf2_prefix: str, flax_prefix: Path, center: bool = True):
        out[vv(f"{tf2_prefix}/gamma")] = ("params", flax_prefix + ("scale",))
        if center:
            out[vv(f"{tf2_prefix}/beta")] = ("params", flax_prefix + ("bias",))
        out[vv(f"{tf2_prefix}/moving_mean")] = ("batch_stats", flax_prefix + ("mean",))
        out[vv(f"{tf2_prefix}/moving_variance")] = ("batch_stats", flax_prefix + ("var",))

    R = ("resnet",)
    STEM = "resnet_model/initial_conv_relu_max_pool"

    # --- stem (tf2/resnet.py:549-612) ---
    if cifar:
        # [conv, Identity, BNR, Identity]
        add_conv(f"{STEM}/0/conv2d", R + ("initial_conv", "conv2d"))
        add_bn(f"{STEM}/2/bn", R + ("initial_bn", "batch_norm"))
    elif sk:
        # [conv, BNR, conv, BNR, conv, Identity, BNR, MaxPool, Identity]
        add_conv(f"{STEM}/0/conv2d", R + ("initial_conv_0", "conv2d"))
        add_bn(f"{STEM}/1/bn", R + ("initial_bn_0", "batch_norm"))
        add_conv(f"{STEM}/2/conv2d", R + ("initial_conv_1", "conv2d"))
        add_bn(f"{STEM}/3/bn", R + ("initial_bn_1", "batch_norm"))
        add_conv(f"{STEM}/4/conv2d", R + ("initial_conv_2", "conv2d"))
        add_bn(f"{STEM}/6/bn", R + ("initial_bn", "batch_norm"))
    else:
        # [conv, Identity, BNR, MaxPool, Identity]
        add_conv(f"{STEM}/0/conv2d", R + ("initial_conv", "conv2d"))
        add_bn(f"{STEM}/2/bn", R + ("initial_bn", "batch_norm"))

    # --- block groups (tf2/resnet.py:616-699 + block defs :315-485) ---
    for g in range(4):
        strides = 1 if g == 0 else 2
        for b in range(layers[g]):
            base = f"resnet_model/block_groups/{g}/layers/{b}"
            B = R + (f"block_group{g + 1}", f"block_{b}")
            use_projection = b == 0
            if block_type == "residual":
                if use_projection:
                    # shortcut_layers: sk -> [FixedPadding?, AvgPool, conv,
                    # BNR]; else [conv, BNR]  (tf2/resnet.py:329-353)
                    if sk:
                        i0 = (1 if strides > 1 else 0) + 1  # skip pad + pool
                        add_conv(f"{base}/shortcut_layers/{i0}/conv2d",
                                 B + ("proj_conv", "conv2d"))
                        add_bn(f"{base}/shortcut_layers/{i0 + 1}/bn",
                               B + ("proj_bn", "batch_norm"))
                    else:
                        add_conv(f"{base}/shortcut_layers/0/conv2d",
                                 B + ("proj_conv", "conv2d"))
                        add_bn(f"{base}/shortcut_layers/1/bn",
                               B + ("proj_bn", "batch_norm"))
                # conv2d_bn_layers: [conv, BNR, conv, BNR] (:355-366)
                add_conv(f"{base}/conv2d_bn_layers/0/conv2d", B + ("conv_0", "conv2d"))
                add_bn(f"{base}/conv2d_bn_layers/1/bn", B + ("bn_0", "batch_norm"))
                add_conv(f"{base}/conv2d_bn_layers/2/conv2d", B + ("conv_1", "conv2d"))
                add_bn(f"{base}/conv2d_bn_layers/3/bn", B + ("bn_1", "batch_norm"))
                if se:
                    add_conv(f"{base}/se_layer/se_reduce", B + ("se", "se_reduce"), bias=True)
                    add_conv(f"{base}/se_layer/se_expand", B + ("se", "se_expand"), bias=True)
            else:
                if use_projection:
                    # projection_layers (tf2/resnet.py:398-423)
                    if sk:
                        i0 = (1 if strides > 1 else 0) + 1
                        add_conv(f"{base}/projection_layers/{i0}/conv2d",
                                 B + ("proj_conv", "conv2d"))
                        add_bn(f"{base}/projection_layers/{i0 + 1}/bn",
                               B + ("proj_bn", "batch_norm"))
                    else:
                        add_conv(f"{base}/projection_layers/0/conv2d",
                                 B + ("proj_conv", "conv2d"))
                        add_bn(f"{base}/projection_layers/1/bn",
                               B + ("proj_bn", "batch_norm"))
                # conv_relu_dropblock_layers (tf2/resnet.py:429-474):
                # [conv, BNR, Drop, (SK | conv, BNR), Drop, conv, BNR, Drop,
                #  SE?]
                L = f"{base}/conv_relu_dropblock_layers"
                add_conv(f"{L}/0/conv2d", B + ("conv_0", "conv2d"))
                add_bn(f"{L}/1/bn", B + ("bn_0", "batch_norm"))
                if sk:
                    S = B + ("sk_conv2d",)
                    add_conv(f"{L}/3/conv2d_fixed_padding/conv2d",
                             S + ("conv2d_fixed_padding", "conv2d"))
                    add_bn(f"{L}/3/batch_norm_relu/bn",
                           S + ("batch_norm_relu", "batch_norm"))
                    add_conv(f"{L}/3/conv2d_0", S + ("conv2d_0",))
                    add_bn(f"{L}/3/batch_norm_relu_1/bn",
                           S + ("batch_norm_relu_1", "batch_norm"))
                    add_conv(f"{L}/3/conv2d_1", S + ("conv2d_1",))
                    i_conv2, i_bn2, i_se = 5, 6, 8
                else:
                    add_conv(f"{L}/3/conv2d", B + ("conv_1", "conv2d"))
                    add_bn(f"{L}/4/bn", B + ("bn_1", "batch_norm"))
                    i_conv2, i_bn2, i_se = 6, 7, 9
                add_conv(f"{L}/{i_conv2}/conv2d", B + ("conv_2", "conv2d"))
                add_bn(f"{L}/{i_bn2}/bn", B + ("bn_2", "batch_norm"))
                if se:
                    add_conv(f"{L}/{i_se}/se_reduce", B + ("se", "se_reduce"), bias=True)
                    add_conv(f"{L}/{i_se}/se_expand", B + ("se", "se_expand"), bias=True)

    # --- projection head (tf2/model.py:157-213) ---
    P = ("projection_head",)
    if config.proj_head_mode == "linear":
        out[vv("_projection_head/linear_layers/0/dense/kernel")] = (
            "params", P + ("l_0", "dense", "kernel"))
        add_bn("_projection_head/linear_layers/0/bn_relu/bn",
               P + ("l_0", "bn_relu", "batch_norm"), center=False)
    elif config.proj_head_mode == "nonlinear":
        for j in range(config.num_proj_layers):
            mid = j != config.num_proj_layers - 1
            nl = f"nl_{j}"
            out[vv(f"_projection_head/linear_layers/{j}/dense/kernel")] = (
                "params", P + (nl, "dense", "kernel"))
            add_bn(f"_projection_head/linear_layers/{j}/bn_relu/bn",
                   P + (nl, "bn_relu", "batch_norm"), center=mid)

    # --- supervised head (tf2/model.py:216-225) ---
    H = ("head_supervised", "linear_layer")
    out[vv("supervised_head/linear_layer/dense/kernel")] = ("params", H + ("dense", "kernel"))
    out[vv("supervised_head/linear_layer/dense/bias")] = ("params", H + ("dense", "bias"))

    return out


def _set_in(tree: dict, path: Path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def resolve_tf_checkpoint(path: str):
    """Return the TF checkpoint prefix when ``path`` designates one (a
    ``<prefix>`` with ``<prefix>.index`` beside it, or a directory holding TF
    checkpoints), else None.  Lets --checkpoint accept released TF
    checkpoints directly, like the reference's init_from_checkpoint
    (model.py:162-168)."""
    import os

    if os.path.exists(path + ".index"):
        return path
    if os.path.isdir(path):
        try:
            import tensorflow as tf

            latest = tf.train.latest_checkpoint(path)
            if latest:
                return latest
        except Exception:
            pass
        idx = sorted(f for f in os.listdir(path) if f.endswith(".index"))
        if idx:
            return os.path.join(path, idx[-1][:-len(".index")])
    return None


def load_tf_checkpoint(ckpt_path: str) -> Dict[str, np.ndarray]:
    """Read all variables of a TF checkpoint into numpy (requires tf)."""
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()
    return {name: reader.get_tensor(name) for name in shapes}


def detect_tf_naming(tf_vars: Dict[str, np.ndarray]) -> str:
    """'tf2' for object-path checkpoints (tf.train.Checkpoint keys carry
    .ATTRIBUTES/VARIABLE_VALUE, tf2/run.py:308-337), else 'tf1' (graph-mode
    variable names, run.py:388-419)."""
    return ("tf2" if any(".ATTRIBUTES/VARIABLE_VALUE" in k for k in tf_vars)
            else "tf1")


def _get_in(tree: dict, path: Path):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def export_tf_checkpoint(config: Config, params: dict, batch_stats: dict,
                         ckpt_prefix: str, naming: str = "tf2",
                         strict: bool = True) -> str:
    """Write (params, batch_stats) as a TF checkpoint in a released naming
    scheme, so reference-side tooling (run.py --checkpoint warm starts,
    model.py:162-168 init_from_checkpoint, the colabs' loaders) can consume
    checkpoints trained by this framework.  The inverse of
    ``import_tf_checkpoint`` — both directions share the same variable maps.

    ``naming``: 'tf2' = object paths (tf2/run.py:308-337 tf.train.Checkpoint
    keys), 'tf1' = graph auto-numbering (run.py:388-419).  Returns the
    written checkpoint prefix.

    TF2 object-path keys cannot be reproduced through Keras object graphs in
    current TF (Keras 3 renames attributes and drops tracking), so both
    schemes are written the same robust way: a TF1 Saver with an explicit
    ``var_list`` keyed by the exact checkpoint name (this is also how the
    import-shim test fixtures are produced, tests/test_checkpoint_compat.py).
    """
    import tensorflow.compat.v1 as tf1

    mapping = (tf2_variable_map(config) if naming == "tf2"
               else tf1_variable_map(config))
    missing: List[str] = []
    arrays: Dict[str, np.ndarray] = {}
    for tf_name, (collection, path) in mapping.items():
        tree = params if collection == "params" else batch_stats
        value = _get_in(tree, path)
        if value is None:
            missing.append(tf_name)
            continue
        arrays[tf_name] = np.asarray(value, dtype=np.float32)
    if strict and missing:
        raise KeyError(
            f"{len(missing)} mapped variables absent from the model trees, "
            f"e.g. {missing[:5]} — config does not match the parameters?")

    with tf1.Graph().as_default():
        # Saver writes each variable under its var_list KEY; the in-graph
        # variable names are irrelevant (and checkpoint keys like
        # '.../.ATTRIBUTES/VARIABLE_VALUE' are not legal variable names).
        var_list = {name: tf1.Variable(v, name=f"v_{i}")
                    for i, (name, v) in enumerate(sorted(arrays.items()))}
        saver = tf1.train.Saver(var_list=var_list)
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, ckpt_prefix, write_meta_graph=False)
    return ckpt_prefix


def import_tf_checkpoint(config: Config, ckpt_path: str,
                         strict: bool = True) -> Tuple[dict, dict]:
    """Load a released TF SimCLR checkpoint into (params, batch_stats) trees
    matching this framework's model structure.  Handles both released naming
    schemes: TF1 graph auto-numbering and TF2 object paths (auto-detected)."""
    tf_vars = load_tf_checkpoint(ckpt_path)
    if detect_tf_naming(tf_vars) == "tf2":
        mapping = tf2_variable_map(config)
    else:
        mapping = tf1_variable_map(config)
    params: dict = {}
    batch_stats: dict = {}
    missing: List[str] = []
    for tf_name, (collection, path) in mapping.items():
        if tf_name not in tf_vars:
            missing.append(tf_name)
            continue
        value = np.asarray(tf_vars[tf_name])
        _set_in(params if collection == "params" else batch_stats, path, value)
    if strict and missing:
        raise KeyError(f"{len(missing)} mapped variables absent from checkpoint, "
                       f"e.g. {missing[:5]}")
    return params, batch_stats


def rescale_encoder_conv_kernels(params: dict, factor: float) -> dict:
    """'Known issues' shim for mixing SimCLRv1 / v2 checkpoints (reference
    README.md:198): the two versions were pretrained with different weight
    decays, so v1 conv-kernel norms are on average ~16.8x the v2 scale.
    Finetuning with LARS is scale-robust (trust ratio), but the momentum
    optimizer needs either rescaled hparams or rescaled weights — the
    reference suggests re-scaling the conv ``kernel`` parameters of
    ``base_model``.  This multiplies every 4-D conv kernel in the encoder
    subtree (``params['resnet']`` = the reference's ``base_model``) by
    ``factor``, leaving dense/BN/head parameters untouched."""
    import jax

    if "resnet" not in params:
        raise ValueError(
            "rescale_encoder_conv_kernels expects the params tree rooted at "
            "the model (with a 'resnet' encoder subtree); got keys "
            f"{sorted(params)} — pass variables['params'], not the full "
            "variables dict or a subtree, or the requested rescale would be "
            "silently skipped")

    n_scaled = 0

    def scale(path, leaf):
        nonlocal n_scaled
        if (path and getattr(path[-1], "key", None) == "kernel"
                and getattr(leaf, "ndim", 0) == 4):
            n_scaled += 1
            return np.asarray(leaf) * factor
        return leaf

    resnet = jax.tree_util.tree_map_with_path(scale, params["resnet"])
    if n_scaled == 0:
        raise ValueError(
            "rescale_encoder_conv_kernels found no 4-D conv kernels under "
            "params['resnet'] — nothing was rescaled; is this a valid "
            "encoder params tree?")
    return {**params, "resnet": resnet}
