"""Checkpoint / restore / warm-start surgery (reference C15).

Orbax-backed replacement for run.py:388-411 / tf2/run.py:308-337:
  * periodic save with keep-max GC,
  * resume-latest (full state: params + batch_stats + optimizer + step),
  * warm-start from --checkpoint: model weights only, filtered by the
    --variable_schema regex (model.py:162-168), optional zero-init of the
    supervised head (model.py:170-183 / tf2/run.py:435-463).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from simclr_tpu.config import Config
from simclr_tpu.optim.lars import param_path_strings
from simclr_tpu.training.state import TrainState


def create_manager(model_dir: str, keep_max: int = 5) -> ocp.CheckpointManager:
    # Async checkpointing: manager.save() snapshots to host memory and
    # returns; serialization + disk writes run on a background thread so the
    # periodic save is off the training critical path (the reference's
    # Estimator/CheckpointManager saves block the train loop,
    # run.py:388-411 / tf2/run.py:649).  Callers that need the files on
    # disk pass wait=True to save() or call manager.wait_until_finished().
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep_max, create=True, enable_async_checkpointing=True)
    return ocp.CheckpointManager(model_dir, options=options)


def save(manager: ocp.CheckpointManager, state: TrainState, wait: bool = True):
    """Save a full-state checkpoint.  ``wait=False`` overlaps the write with
    subsequent training (the async manager snapshots device arrays to host
    before returning, so the save stays valid even though train steps donate
    and replace the state buffers).

    Device arrays are passed to Orbax directly: each process writes only its
    addressable shards (a device_get here would try to assemble the full
    array on every host — a memory spike for FSDP states and an error for
    cross-process shardings), and the checkpoint stores the GLOBAL array, so
    it can be restored onto a different mesh (see ``restore``)."""
    step = int(jax.device_get(state.step))
    manager.save(step, args=ocp.args.StandardSave(
        {"params": state.params, "batch_stats": state.batch_stats,
         "opt_state": state.opt_state, "step": state.step}
    ))
    if wait:
        manager.wait_until_finished()


def latest_step(manager: ocp.CheckpointManager) -> Optional[int]:
    return manager.latest_step()


def restore(manager: ocp.CheckpointManager, state: TrainState, step: Optional[int] = None) -> TrainState:
    """Full-state resume (tf2/run.py:316-321).

    The restore target is abstract arrays carrying the LIVE shardings of
    ``state`` (the mesh layout init_state produced), so Orbax lays each
    array straight onto the current mesh — each process reads only its
    shards, FSDP states resume without a replication memory spike, and the
    restore is ELASTIC: checkpoints store global arrays, so a run saved on
    an 8-device mesh resumes on 4 devices (or 1) with only a config
    change."""
    step = step if step is not None else manager.latest_step()
    target = {"params": state.params, "batch_stats": state.batch_stats,
              "opt_state": state.opt_state, "step": state.step}

    def as_abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return np.asarray(x)

    abstract = jax.tree.map(as_abstract, target)
    restored = manager.restore(step, args=ocp.args.StandardRestore(abstract))
    return state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"], step=jnp.asarray(restored["step"], jnp.int32),
    )


def schema_matcher(variable_schema: str):
    """Compile --variable_schema into a name predicate with TF1 semantics.

    TF1 filters warm-start variables with ``tf.global_variables(schema)``
    (model.py:165-168), which applies ``re.match(schema, name)`` — i.e. the
    pattern is anchored at the start of the variable name.  The reference's
    default ``'?!global_step'`` is not a valid Python regex (re.compile
    raises 'nothing to repeat'); its documented intent is 'everything except
    global_step', so a leading ``?!`` is normalized to the negative
    lookahead ``(?!...)`` which, under re.match, selects every name NOT
    starting with the suffix."""
    schema = variable_schema
    if schema.startswith("?!"):
        schema = "(?!" + schema[2:] + ")"
    try:
        rx = re.compile(schema)
    except re.error as e:
        raise ValueError(f"invalid --variable_schema {variable_schema!r}: {e}")
    return lambda name: rx.match(name) is not None


def _filter_by_schema(new_tree, restored_tree, variable_schema: str):
    """Keep restored values only where the path matches the schema regex
    (TF1 --variable_schema semantics, model.py:165-168 — see
    schema_matcher).  Joined by path name so the source tree may have extra
    or missing subtrees (e.g. a pretrain run without the supervised head)."""
    matcher = schema_matcher(variable_schema)
    restored_by_name = dict(zip(param_path_strings(restored_tree),
                                jax.tree_util.tree_leaves(restored_tree)))
    names = param_path_strings(new_tree)
    new_leaves = jax.tree_util.tree_leaves(new_tree)
    treedef = jax.tree_util.tree_structure(new_tree)
    out = []
    for name, new_leaf in zip(names, new_leaves):
        matches = matcher(name)
        res_leaf = restored_by_name.get(name)
        if matches and res_leaf is not None and tuple(res_leaf.shape) == tuple(new_leaf.shape):
            out.append(jnp.asarray(res_leaf, new_leaf.dtype))
        else:
            out.append(new_leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def _zero_init_head(params):
    """Zero the supervised head weights (model.py:170-183)."""
    if "head_supervised" not in params:
        return params
    head = jax.tree.map(jnp.zeros_like, params["head_supervised"])
    return {**params, "head_supervised": head}


def warm_start(config: Config, state: TrainState, checkpoint_path: str) -> TrainState:
    """Model-weights-only restore from another run's checkpoint dir or a
    specific step dir (tf2/run.py:324-337).

    Restores the raw saved tree (no target) and takes only params +
    batch_stats — the source run's optimizer state may have a different
    structure (e.g. pretrain-LARS -> finetune-momentum).

    Also accepts a released TF checkpoint (TF1 graph names or TF2 object
    paths, auto-detected) like the reference's init_from_checkpoint
    (model.py:162-168) — the variable_schema filter and zero-init surgery
    apply identically."""
    import os

    from simclr_tpu import checkpoint_compat as compat

    tf_prefix = compat.resolve_tf_checkpoint(checkpoint_path)
    if tf_prefix is not None:
        tf_params, tf_stats = compat.import_tf_checkpoint(
            config, tf_prefix, strict=False)
        params = _filter_by_schema(state.params, tf_params, config.variable_schema)
        if config.zero_init_logits_layer:
            params = _zero_init_head(params)
        batch_stats = _filter_by_schema(state.batch_stats, tf_stats, r"?!global_step")
        return state.replace(params=params, batch_stats=batch_stats)

    mngr = ocp.CheckpointManager(checkpoint_path)
    step = mngr.latest_step()
    if step is None:
        # A bare step directory (<run>/<step>) was passed: restore that step
        # through a manager rooted at its parent.
        norm = os.path.normpath(checkpoint_path)
        base, parent = os.path.basename(norm), os.path.dirname(norm)
        if base.isdigit():
            mngr = ocp.CheckpointManager(parent)
            step = int(base)
    if step is None:
        raise FileNotFoundError(
            f"--checkpoint={checkpoint_path} contains no checkpoints "
            "(expected an Orbax run directory, a specific step directory, or "
            "a TF checkpoint prefix/directory)")
    restored = mngr.restore(step)

    params = _filter_by_schema(state.params, restored["params"], config.variable_schema)
    if config.zero_init_logits_layer:
        params = _zero_init_head(params)
    batch_stats = _filter_by_schema(state.batch_stats, restored["batch_stats"], r"?!global_step")
    return state.replace(params=params, batch_stats=batch_stats)


def try_restore_or_warm_start(config: Config, state: TrainState,
                              manager: ocp.CheckpointManager) -> TrainState:
    """Resume-latest beats warm-start (tf2/run.py:308-337)."""
    if manager.latest_step() is not None:
        return restore(manager, state)
    if config.checkpoint:
        return warm_start(config, state, config.checkpoint)
    return state
