"""Device mesh + sharding policy.

Replaces the reference's TPU cluster bring-up (run.py:391-399,
tf2/run.py:491-502 — TPUClusterResolver / initialize_tpu_system /
CrossShardOptimizer) with the JAX-native stack: ``jax.distributed`` for
multi-host, a ``jax.sharding.Mesh`` over ICI, and GSPMD propagation from
``NamedSharding`` annotations.  Gradient all-reduce, sync-BN statistics and
the NT-Xent all-gather all come out of the partitioner as XLA collectives
over the 'data' axis (SURVEY.md §2.3 N1-N4).

Optional ZeRO/FSDP-style parameter sharding over the same axis for the
large encoders (R152-3x+SK = 795M params does not want 8 full replicas in
HBM at big batch): parameters whose largest dim divides the axis size are
sharded on it; everything else stays replicated.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simclr_tpu.config import Config

DATA_AXIS = "data"
DCN_AXIS = "dcn"  # across-slice axis (data-center network, SURVEY §5)
SPATIAL_AXIS = "spatial"  # image-height sharding (GSPMD conv halo exchange)
MODEL_AXIS = "model"  # tensor-parallel axis (output-channel param sharding)


def maybe_initialize_distributed():
    """Multi-host bring-up (reference N4).  No-op for single-process.

    On TPU pods ``jax.distributed.initialize()`` auto-detects the cluster;
    elsewhere (CPU gloo tests, bespoke clusters) the coordinator/process
    identity comes from SIMCLR_TPU_{COORDINATOR,PROCESS_ID} env vars.
    Idempotent: repeated calls (train then eval in one process) are no-ops.
    """
    global _DISTRIBUTED_UP
    if int(os.environ.get("SIMCLR_TPU_NUM_PROCESSES", "1")) <= 1:
        return
    if _DISTRIBUTED_UP:  # NB: probing jax.process_count() here would itself
        return           # initialize the backend, defeating the purpose.
    coord = os.environ.get("SIMCLR_TPU_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["SIMCLR_TPU_NUM_PROCESSES"]),
            process_id=int(os.environ["SIMCLR_TPU_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()
    _DISTRIBUTED_UP = True


_DISTRIBUTED_UP = False


def create_mesh(config: Optional[Config] = None, devices=None) -> Mesh:
    """Build the device mesh.

    Default: 1-D mesh over all devices on the 'data' axis (pure DP, the
    reference's only strategy — SURVEY.md §2.2).  With
    ``--dcn_data_parallelism=S`` > 1 the mesh is 2-D ('dcn', 'data'):
    the outer axis spans the S slices over DCN and the inner axis the chips
    within a slice over ICI, so the partitioner's gradient/BN/NT-Xent
    collectives reduce hierarchically — the heavy traffic rides ICI and only
    the per-slice partials cross DCN (jax-ml scaling-book multi-slice
    recipe).  On real multi-slice TPU hardware the device order comes from
    mesh_utils.create_hybrid_device_mesh; elsewhere (virtual CPU meshes,
    tests) a plain reshape is used."""
    devices = devices if devices is not None else jax.devices()
    dcn = getattr(config, "dcn_data_parallelism", 1) if config is not None else 1
    sp = getattr(config, "spatial_partition", 1) if config is not None else 1
    if sp and sp > 1:
        if dcn and dcn > 1 or (config is not None and config.mesh_shape):
            raise ValueError(
                "--spatial_partition cannot be combined with "
                "--dcn_data_parallelism or --mesh_shape")
        if len(devices) % sp:
            raise ValueError(
                f"--spatial_partition={sp} does not divide {len(devices)} devices")
        arr = np.asarray(devices).reshape(len(devices) // sp, sp)
        return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))
    if dcn and dcn > 1:
        if len(devices) % dcn:
            raise ValueError(
                f"--dcn_data_parallelism={dcn} does not divide {len(devices)} devices")
        per_slice = len(devices) // dcn
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                (per_slice,), (dcn,), devices=devices)
            # hybrid helper returns (dcn*per,) ordered slice-major
            arr = np.asarray(arr).reshape(dcn, per_slice)
        except Exception:  # virtual/CPU meshes have no slice_index metadata
            arr = np.asarray(devices).reshape(dcn, per_slice)
        return Mesh(arr, (DCN_AXIS, DATA_AXIS))
    if config is not None and config.mesh_shape:
        shape = tuple(int(x) for x in str(config.mesh_shape).split(","))
    else:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh_shape {shape} does not match {len(devices)} devices")
    axis_names = (DATA_AXIS,) if len(shape) == 1 else (DATA_AXIS, MODEL_AXIS)[: len(shape)]
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_axes(mesh: Mesh):
    """The mesh axes the batch dimension shards over: ('dcn', 'data') on a
    multi-slice mesh, 'data' otherwise."""
    return (DCN_AXIS, DATA_AXIS) if DCN_AXIS in mesh.axis_names else DATA_AXIS


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(batch_axes(mesh)))


def num_batch_shards(mesh: Mesh) -> int:
    """How many ways the batch dimension is sharded (= reference replica
    count for per-replica BN statistics)."""
    axes = batch_axes(mesh)
    axes = axes if isinstance(axes, tuple) else (axes,)
    return int(np.prod([mesh.shape[a] for a in axes]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_spec(leaf, axis_size: int) -> P:
    """PartitionSpec for one param under FSDP: shard the largest dim that
    divides the data-axis size; replicate otherwise.

    1-D params (BN scale/offset/moving stats, biases) are NEVER sharded:
    their memory is trivial (C floats), and sharding a channel vector makes
    GSPMD propagate CHANNEL sharding onto every (B,H,W,C) activation it
    touches — measured at R50/224² on the 8-device mesh as 86 partial-sum
    all-reduces of up to 51 MB activations per step before this rule
    (tests/test_hlo_collectives.py::test_fsdp_flagship_scale...).  FSDP's
    savings live in the matrices."""
    shape = getattr(leaf, "shape", ())
    if len(shape) < 2 or max(shape) < 1024:
        return P()
    dims = sorted(range(len(shape)), key=lambda i: -shape[i])
    for d in dims:
        if shape[d] % axis_size == 0 and shape[d] >= axis_size:
            spec = [None] * len(shape)
            spec[d] = DATA_AXIS
            return P(*spec)
    return P()


def param_spec(leaf, mesh: Mesh, fsdp: bool = False) -> P:
    """PartitionSpec for one param/optimizer leaf under the mesh's policy.

    Tensor parallelism (a 'model' mesh axis, --mesh_shape=D,M): large
    (>=64K-element, >=2-D) parameters shard their output-channel (last) dim
    over 'model' — the weight-stationary Megatron recipe; GSPMD propagates
    channel-sharded activations through the conv tower and inserts the
    all-gathers/reduce-scatters where consecutive layers disagree
    (scaling-book TP recipe).  BN vectors and other small leaves stay
    replicated (their collectives would cost more than the memory saved).

    FSDP (ZeRO) composes: the largest remaining unsharded dim that divides
    the data-axis size is sharded over 'data'."""
    shape = getattr(leaf, "shape", ())
    spec = [None] * len(shape)
    if MODEL_AXIS in mesh.axis_names and len(shape) >= 2:
        m = mesh.shape[MODEL_AXIS]
        if shape[-1] % m == 0 and shape[-1] >= m and int(np.prod(shape)) >= 65536:
            spec[-1] = MODEL_AXIS
    if fsdp and len(shape) >= 2 and max(shape) >= 1024:
        # >= 2-D only: sharding 1-D channel vectors (BN params) cascades
        # channel sharding onto activations — see fsdp_spec.
        axis_size = mesh.shape[DATA_AXIS]
        for d in sorted(range(len(shape)), key=lambda i: -shape[i]):
            if (spec[d] is None and shape[d] % axis_size == 0
                    and shape[d] >= axis_size):
                spec[d] = DATA_AXIS
                break
    while spec and spec[-1] is None:  # P(None,..) != P() under spec equality
        spec.pop()
    return P(*spec)


def state_shardings(mesh: Mesh, state, fsdp: bool = False):
    """Sharding pytree for a TrainState: params/opt-state replicated, or
    sharded per the mesh policy (FSDP over 'data', TP over 'model' — see
    param_spec); scalars replicated."""

    def leaf_sharding(leaf):
        return NamedSharding(mesh, param_spec(leaf, mesh, fsdp=fsdp))

    return jax.tree.map(leaf_sharding, state)
