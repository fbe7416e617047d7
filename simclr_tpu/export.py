"""Serving export (reference C17: run.py:248-305 hub module,
tf2/run.py:241-305 SavedModel).

JAX-native replacement: a saved serving bundle = Orbax params/batch_stats +
flags.json, and a loader that rebuilds a jitted callable returning the
reference's salient-tensor dictionary with identical endpoint names:
``initial_conv``, ``initial_max_pool``, ``block_group1..4``,
``final_avg_pool`` (the ``default`` output), ``proj_head_input``,
``proj_head_output`` and, for finetuned models, ``logits_sup``
(tf2/run.py:241-260).  ``trainable=True/False`` maps to train-mode BN vs
frozen statistics like the reference's two concrete functions
(tf2/run.py:263-284).

Keeps at most ``keep_hub_module_max`` exports (run.py:186-188).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from simclr_tpu.config import Config
from simclr_tpu.models.model import SimCLRModel
from simclr_tpu.training.state import TrainState

EXPORT_DIR = "saved_model"


def export_serving(config: Config, state: TrainState, num_classes: int,
                   model_dir: Optional[str] = None) -> str:
    """Write a serving bundle under <model_dir>/saved_model/<step>."""
    model_dir = model_dir or config.model_dir
    step = int(jax.device_get(state.step))
    base = os.path.join(model_dir, EXPORT_DIR)
    path = os.path.join(base, str(step))
    if os.path.exists(path):
        shutil.rmtree(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(
        os.path.join(path, "variables"),
        jax.device_get({"params": state.params, "batch_stats": state.batch_stats}),
    )
    with open(os.path.join(path, "serving_config.json"), "w") as f:
        json.dump({**config.to_dict(), "num_classes": num_classes, "step": step}, f, indent=2)

    # keep-max GC (run.py:186-188, keep_hub_module_max default 1).
    existing = sorted((int(d) for d in os.listdir(base) if d.isdigit()))
    for old in existing[: max(0, len(existing) - config.keep_hub_module_max)]:
        shutil.rmtree(os.path.join(base, str(old)), ignore_errors=True)
    return path


def _load_bundle(path: str):
    """(config, num_classes, variables) from a serving bundle directory."""
    with open(os.path.join(path, "serving_config.json")) as f:
        cfg_dict = json.load(f)
    num_classes = cfg_dict.pop("num_classes")
    cfg_dict.pop("step", None)
    known = {f.name for f in __import__("dataclasses").fields(Config)}
    config = Config(**{k: v for k, v in cfg_dict.items() if k in known})
    variables = ocp.PyTreeCheckpointer().restore(os.path.join(path, "variables"))
    return config, num_classes, variables


def load_serving(path: str) -> Callable[..., Dict[str, jnp.ndarray]]:
    """Load a serving bundle -> callable(images, trainable=False) -> dict.

    Mirrors colab usage ``saved_model(x, trainable=False)['final_avg_pool']``
    (tf2/colabs/finetuning.ipynb cell 9).
    """
    config, num_classes, variables = _load_bundle(path)
    model = SimCLRModel.from_config(config, num_classes)

    def serve(images, trainable: bool = False):
        """trainable=False: inference graph, frozen moving BN statistics.
        trainable=True: training graph — BN normalizes with the current
        batch's statistics (the reference's two concrete functions,
        tf2/run.py:263-284; moving averages are discarded, the bundle's
        variables are immutable)."""
        var_in = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
        if trainable:
            out, _ = model.apply(var_in, images, train=True,
                                 return_endpoints=True, mutable=["batch_stats"])
        else:
            out = model.apply(var_in, images, train=False, return_endpoints=True)
        _, _, endpoints = out
        endpoints = dict(endpoints)
        endpoints["default"] = endpoints["final_avg_pool"]
        return endpoints

    return jax.jit(serve, static_argnames=("trainable",))


def export_stablehlo(bundle_path: str, out_path: Optional[str] = None,
                     platforms=("cpu", "tpu")) -> str:
    """Serialize the frozen-BN inference graph to a portable StableHLO
    artifact via ``jax.export`` — the TPU-native serving format.

    The reference ships serving as a TF SavedModel (tf2/run.py:241-305);
    that artifact exists here too (``export_tf_savedmodel``).  This one is
    for serving stacks that speak XLA directly (a C++ PJRT runtime, or any
    JAX process): the artifact is the compiled-IR contract itself — no
    Python model code, flax, or even this package needed to run it, and the
    multi-platform lowering serves the SAME bytes on CPU and TPU.

    The batch dimension is symbolic, so one artifact serves any batch size.
    Model variables stay in the bundle's Orbax ``variables`` tree (passed
    as call arguments, keeping the artifact a few hundred KB instead of
    baking hundreds of MB of weights into the IR); ``load_stablehlo``
    pairs the two.  Returns the artifact path
    (``<bundle>/serving.stablehlo``).
    """
    from jax import export as jax_export

    config, num_classes, variables = _load_bundle(bundle_path)
    model = SimCLRModel.from_config(config, num_classes)
    var_in = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    flat, treedef = jax.tree.flatten(var_in)

    def serve_flat(flat_vars, images):
        out = model.apply(jax.tree.unflatten(treedef, flat_vars), images,
                          train=False, return_endpoints=True)
        _, _, endpoints = out
        endpoints = dict(endpoints)
        endpoints["default"] = endpoints["final_avg_pool"]
        return endpoints

    hw = config.image_size
    (b,) = jax_export.symbolic_shape("b")
    img_spec = jax.ShapeDtypeStruct((b, hw, hw, 3), jnp.float32)
    var_specs = [jax.ShapeDtypeStruct(v.shape, v.dtype) for v in flat]
    exported = jax_export.export(
        jax.jit(serve_flat), platforms=tuple(platforms))(var_specs, img_spec)
    out_path = out_path or os.path.join(bundle_path, "serving.stablehlo")
    with open(out_path, "wb") as f:
        f.write(exported.serialize())
    return out_path


def load_stablehlo(bundle_path: str, artifact: Optional[str] = None):
    """Rehydrate a ``serving.stablehlo`` artifact + the bundle's variables
    into ``callable(images) -> endpoint dict`` (inference graph only)."""
    from jax import export as jax_export

    artifact = artifact or os.path.join(bundle_path, "serving.stablehlo")
    with open(artifact, "rb") as f:
        exported = jax_export.deserialize(f.read())
    _, _, variables = _load_bundle(bundle_path)
    var_in = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    flat, _ = jax.tree.flatten(var_in)
    flat = [jnp.asarray(v) for v in flat]
    return lambda images: exported.call(flat, images)


def export_tf_savedmodel(bundle_path: str, out_path: Optional[str] = None) -> str:
    """Convert a serving bundle to a TF-ecosystem-consumable SavedModel.

    The reference's export is a SavedModel with two concrete functions over a
    shared variable set — trainable=True (train-mode BN) and trainable=False
    (frozen statistics) — whose outputs are the salient-tensor dict
    (tf2/run.py:241-305).  This is that artifact, produced from the JAX
    model via jax2tf: load with ``tf.saved_model.load(path)`` and call
    ``m(images)`` / ``m.serve_trainable(images)`` (batch-polymorphic NHWC
    float32 in [0, 1]); every endpoint name matches the reference
    (``default``, ``final_avg_pool``, ``proj_head_output``, ...).

    Requires tensorflow importable (CPU is fine); raises ImportError
    otherwise.  Returns the SavedModel directory.
    """
    import tensorflow as tf  # noqa: deferred heavy import
    from jax.experimental import jax2tf

    config, num_classes, variables = _load_bundle(bundle_path)
    model = SimCLRModel.from_config(config, num_classes)

    def fwd(var_in, images, train: bool):
        if train:
            out, _ = model.apply(var_in, images, train=True,
                                 return_endpoints=True, mutable=["batch_stats"])
        else:
            out = model.apply(var_in, images, train=False, return_endpoints=True)
        _, _, endpoints = out
        endpoints = dict(endpoints)
        endpoints["default"] = endpoints["final_avg_pool"]
        return endpoints

    var_in = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    hw = config.image_size
    poly = [None, f"(b, {hw}, {hw}, 3)"]

    class _Module(tf.Module):
        def __init__(self):
            super().__init__()
            # One shared tf.Variable set across both signatures, like the
            # reference's saved_model.model variables (tf2/run.py:263-284).
            flat, self._treedef = jax.tree.flatten(var_in)
            self._tf_vars = [tf.Variable(v, trainable=False) for v in flat]
            self._serve = jax2tf.convert(
                lambda vs, im: fwd(jax.tree.unflatten(self._treedef, vs), im, False),
                polymorphic_shapes=poly, with_gradient=False)
            self._train = jax2tf.convert(
                lambda vs, im: fwd(jax.tree.unflatten(self._treedef, vs), im, True),
                polymorphic_shapes=poly, with_gradient=False)

        @tf.function(autograph=False,
                     input_signature=[tf.TensorSpec([None, hw, hw, 3], tf.float32)])
        def __call__(self, images):
            return self._serve(self._tf_vars, images)

        @tf.function(autograph=False,
                     input_signature=[tf.TensorSpec([None, hw, hw, 3], tf.float32)])
        def serve_trainable(self, images):
            return self._train(self._tf_vars, images)

    module = _Module()
    out_path = out_path or os.path.join(bundle_path, "tf_saved_model")
    tf.saved_model.save(
        module, out_path,
        signatures={
            "serving_default": module.__call__.get_concrete_function(),
            "serving_trainable": module.serve_trainable.get_concrete_function(),
        },
    )
    return out_path
