"""Training / evaluation driver (reference L6: run.py:363-448,
tf2/run.py:466-667).

Owns: mesh bring-up, state init + sharding, the host train loop around the
fused jitted step, periodic checkpointing, continuous eval, and result
artifacts.  The device never waits on Python: batches are host-prefetched
and dispatch is async; metrics are only fetched every
``train_summary_steps``.
"""

from __future__ import annotations

import logging
import os
import signal
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from simclr_tpu.config import (Config, get_checkpoint_steps, get_train_steps,
                               resolve_use_fused_ntxent)
from simclr_tpu.data.loader import Prefetcher, build_dataset
from simclr_tpu.models.model import SimCLRModel
from simclr_tpu.optim.builder import build_optimizer, masked, trainable_mask
from simclr_tpu.optim.schedule import warmup_cosine_schedule
from simclr_tpu.parallel import mesh as mesh_lib
from simclr_tpu.training import checkpoint as ckpt_lib
from simclr_tpu.training.metrics import MetricLogger, Throughput, write_result_json
from simclr_tpu.training.state import TrainState
from simclr_tpu.training import steps as steps_lib
from simclr_tpu.training.steps import make_eval_step, make_multi_step, make_train_step
from simclr_tpu.utils import compilation_cache

log = logging.getLogger("simclr_tpu")


def build_model_and_optimizer(config: Config, num_examples: int, num_classes: int,
                              mesh=None):
    axis_name = "data" if config.use_shard_map else None
    # --global_bn=false on the GSPMD path: ghost-BN statistics per data
    # shard (reference resnet.py:73-85 per-replica semantics); the shard_map
    # path gets the same via plain local statistics (axis_name dropped).
    bn_stat_groups = 1
    if mesh is not None and not config.global_bn and not config.use_shard_map:
        bn_stat_groups = mesh_lib.num_batch_shards(mesh)
    act_constraint = None
    if config.fsdp and mesh is not None and not config.use_shard_map:
        # FSDP anchoring: pin block-boundary activations to batch sharding
        # so the partitioner keeps every conv batch-parallel and moves
        # PARAMETERS (ZeRO all-gather/reduce per layer) instead of
        # activations — see models/resnet.py::ResNet.act_constraint and
        # tests/test_hlo_collectives.py's FSDP scale guard.
        spec = [mesh_lib.batch_axes(mesh)]
        if mesh_lib.SPATIAL_AXIS in mesh.axis_names:
            spec.append(mesh_lib.SPATIAL_AXIS)
        sharding = NamedSharding(mesh, P(*spec))

        def act_constraint(x):
            return jax.lax.with_sharding_constraint(x, sharding)

    model = SimCLRModel.from_config(config, num_classes, axis_name=axis_name,
                                    bn_stat_groups=bn_stat_groups,
                                    act_constraint=act_constraint)
    lr_fn = warmup_cosine_schedule(config, num_examples)
    tx = build_optimizer(config, lr_fn)
    return model, tx, lr_fn


def init_state(config: Config, model, tx, mesh, canvas_shape) -> TrainState:
    """Initialize params on the mesh (replicated or FSDP-sharded)."""
    h = w = config.image_size
    views = 2 if config.train_mode == "pretrain" else 1
    sample = jnp.zeros((2 * views, h, w, 3), jnp.float32)

    def init_fn(rng):
        variables = model.init(rng, sample, train=False)
        params, batch_stats = variables["params"], variables.get("batch_stats", {})
        mask = trainable_mask(config, params)
        opt_state = masked(tx, mask).init(params)
        return TrainState(step=jnp.zeros([], jnp.int32), params=params,
                          batch_stats=batch_stats, opt_state=opt_state)

    rng = jax.random.PRNGKey(config.seed)
    abstract = jax.eval_shape(init_fn, rng)
    shardings = mesh_lib.state_shardings(mesh, abstract, fsdp=config.fsdp)
    with jax.transfer_guard("allow"):
        state = jax.jit(init_fn, out_shardings=shardings)(rng)
    return state


def _put_batch(batch, mesh):
    sharding = mesh_lib.batch_sharding(mesh)
    return {k: _put_global(v, sharding) for k, v in batch.items()}


def _put_global(x, sharding):
    """Place a host batch on the mesh.  Multi-process: each process holds
    its contiguous slice of the global batch (loaders shard per process,
    reference tf2/data.py:43-47 input_context semantics) and contributes it
    as its addressable shards of one global jax.Array."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def choose_steps_per_loop(config: Config, total_steps: int,
                          checkpoint_steps: int, batch_bytes: int) -> int:
    """Device-loop length, capped so the scan's staged raw input
    (spl x batch uint8 canvases) fits the configured HBM budget.

    The reference's iterations_per_loop (run.py:405) stages nothing — TF
    infeed streams per step — so it never faced this; the XLA scan
    formulation stages its whole input up front, which at reference scale
    (batch 4096 x 256^2 canvas = ~0.8 GB/step) must degrade to per-step
    async dispatch rather than OOM."""
    # train_summary_steps=0 disables summaries (reference run.py:82-84), so
    # it must not constrain the loop length.
    summary_steps = config.train_summary_steps or checkpoint_steps
    spl = config.steps_per_loop or min(summary_steps, checkpoint_steps, 64)
    spl = max(1, min(spl, total_steps))
    budget = config.loop_staging_budget_mb * 1024 * 1024
    mem_cap = max(1, budget // max(1, batch_bytes))
    if spl > mem_cap:
        log.info("steps_per_loop %d -> %d (staging %d MB/batch against a %d MB budget)",
                 spl, mem_cap, batch_bytes >> 20, config.loop_staging_budget_mb)
        spl = int(mem_cap)
    return spl


class PreemptionGuard:
    """Preemption-safe training (beyond the reference, SURVEY §5 'no
    preemption hooks').  TPU maintenance events and preemptible/spot VMs
    deliver SIGTERM with a grace window; the reference relies on
    restart-from-last-checkpoint, losing up to checkpoint_steps of work.
    This guard converts the signal into a clean checkpoint-and-exit at the
    next loop boundary, so resume-latest continues exactly (including the
    data order, via set_start_step).  The local flag is only a hint: in a
    multi-process job the signal can land on different sides of a process's
    loop-boundary check, so the trainer all-reduces it across processes at
    each boundary (``sync``) — every process then agrees on the exit step
    and the (collective) preemption save cannot deadlock against a process
    that already entered the next train step."""

    def __init__(self):
        self.triggered = False
        self._prev = None
        self._installed = False

    def sync(self) -> bool:
        """True iff ANY process has received SIGTERM.  Collective: every
        process must call this at the same loop boundary (the trainer's
        boundaries are a pure function of the step, so they line up)."""
        if jax.process_count() <= 1:
            return self.triggered
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(self.triggered, np.int32))
        return bool(np.max(flags) > 0)

    def install(self) -> "PreemptionGuard":
        try:
            self._prev = signal.signal(signal.SIGTERM, self._handle)
            self._installed = True
        except ValueError:
            # Not in the main thread (embedded / test harness): degrade to a
            # no-op guard rather than failing training.
            pass
        return self

    def _handle(self, signum, frame):
        self.triggered = True

    def uninstall(self):
        if self._installed:
            signal.signal(signal.SIGTERM, self._prev)
            self._installed = False


def train(config: Config) -> TrainState:
    assert config.model_dir, "--model_dir is required"
    compilation_cache.maybe_enable(config)
    mesh_lib.maybe_initialize_distributed()
    mesh = mesh_lib.create_mesh(config)
    log.info("mesh: %s", mesh)
    if config.use_shard_map and mesh_lib.DCN_AXIS in mesh.axis_names:
        raise ValueError(
            "--use_shard_map with --dcn_data_parallelism>1 is not supported; "
            "the GSPMD path handles hybrid ICI+DCN meshes (hierarchical "
            "collectives come out of the partitioner)")
    if config.use_shard_map and (mesh_lib.SPATIAL_AXIS in mesh.axis_names
                                 or mesh_lib.MODEL_AXIS in mesh.axis_names):
        raise ValueError(
            "--use_shard_map supports pure data parallelism only; "
            "--spatial_partition and a 'model' mesh axis need the GSPMD "
            "path (the partitioner owns the halo-exchange / tensor-parallel "
            "collectives)")
    # 'auto' is keyed to the island's per-device row tile, which shards over
    # the BATCH axes only — a model/spatial axis does not shrink it.
    fused_ntxent = resolve_use_fused_ntxent(
        config, mesh_lib.num_batch_shards(mesh))

    ds, info = build_dataset(config, is_training=True)
    model, tx, lr_fn = build_model_and_optimizer(
        config, info.num_train_examples, info.num_classes, mesh=mesh)

    state = init_state(config, model, tx, mesh, info.image_shape)
    manager = ckpt_lib.create_manager(config.model_dir, config.keep_checkpoint_max)
    state = ckpt_lib.try_restore_or_warm_start(config, state, manager)

    host_augment = not config.device_augment
    if host_augment:
        # --device_augment=false: the reference's architecture — augment on
        # host CPU (inside the prefetch thread), feed pre-augmented views
        # (data/host_augment.py); the step skips its augmentation stage.
        if config.use_shard_map:
            raise ValueError(
                "--device_augment=false is not supported with "
                "--use_shard_map: the shard_map step shards raw canvases "
                "per replica, not pre-augmented view halves")
        from simclr_tpu.data.host_augment import HostAugmentPipeline

        ds = HostAugmentPipeline(ds, config, jax.random.PRNGKey(config.seed + 1),
                                 host_cropped=info.train_host_cropped)

    mask = trainable_mask(config, state.params)
    masked_tx = masked(tx, mask)
    # Steps are built against the resolved bool; config (and flags.json)
    # keeps the user's 'auto'.
    step_config = config.replace(use_fused_ntxent=fused_ntxent)
    if config.use_shard_map:
        from simclr_tpu.training.steps import make_shard_map_train_step

        train_step = make_shard_map_train_step(
            step_config, model, masked_tx, lr_fn, mesh,
            host_cropped=info.train_host_cropped)
    else:
        train_step = make_train_step(step_config, model, masked_tx, lr_fn,
                                     mesh=mesh, pre_augmented=host_augment,
                                     host_cropped=info.train_host_cropped)
    step_fn = jax.jit(train_step, donate_argnums=(0,))

    total_steps = get_train_steps(config, info.num_train_examples)
    checkpoint_steps = get_checkpoint_steps(config, info.num_train_examples)
    config.save(config.model_dir)  # flags.json parity

    # Device-side loop length (reference iterations_per_loop, run.py:405):
    # amortizes host round-trips; summaries/checkpoints land on loop
    # boundaries like the reference's.
    canvas = info.image_shape
    views = 2 if config.train_mode == "pretrain" else 1
    if host_augment:
        # Pre-augmented float32 views: 2 views x image_size^2 x 3 x 4B.
        batch_bytes = (config.train_batch_size * views
                       * config.image_size * config.image_size * 3 * 4
                       + 4 * config.train_batch_size)
    else:
        # Host-cropped batches carry one uint8 canvas PER VIEW.
        views_in = views if info.train_host_cropped else 1
        batch_bytes = (config.train_batch_size * views_in * int(np.prod(canvas))
                       + 4 * config.train_batch_size)
    spl = choose_steps_per_loop(config, total_steps, checkpoint_steps, batch_bytes)
    multi_fn = (jax.jit(make_multi_step(train_step, spl), donate_argnums=(0,))
                if spl > 1 else None)

    logger = MetricLogger(config.model_dir)
    throughput = Throughput()
    base_rng = jax.random.PRNGKey(config.seed + 1)

    cur_step = int(jax.device_get(state.step))
    log.info("training from step %d to %d (checkpoint every %d, %d steps/loop)",
             cur_step, total_steps, checkpoint_steps, spl)
    if cur_step:
        if hasattr(ds, "set_start_step"):
            # Resume continues the data order from the restored step instead
            # of repeating early-epoch batches.
            ds.set_start_step(cur_step)
        else:
            # Every shipped loader supports resume; a custom source that
            # doesn't restarts its data order — say so instead of silently
            # replaying early epochs.
            log.warning("loader %s has no set_start_step: resumed run "
                        "restarts the data order from step 0",
                        type(ds).__name__)
    it = iter(Prefetcher(ds))
    guard = PreemptionGuard().install()
    t_start = time.time()
    try:
        while cur_step < total_steps:
            remaining = min(total_steps - cur_step,
                            checkpoint_steps - cur_step % checkpoint_steps)
            if multi_fn is not None and remaining >= spl:
                raw = [next(it) for _ in range(spl)]
                stacked = {k: np.stack([b[k] for b in raw]) for k in raw[0]}
                loop_sharding = NamedSharding(mesh, P(None, mesh_lib.batch_axes(mesh)))
                batches = {k: _put_global(v, loop_sharding) for k, v in stacked.items()}
                state, metrics = multi_fn(state, batches, base_rng)
                last_images = stacked["image"][0]
                done = spl
            else:
                raw = next(it)
                batch = _put_batch(raw, mesh)
                state, metrics = step_fn(state, batch, base_rng)
                last_images = raw["image"]
                done = 1
            metrics = dict(metrics)
            aug_views = metrics.pop(steps_lib.VIEW_SUMMARY_KEY, None)
            cur_step += done
            ips = throughput.update(config.train_batch_size * done)
            # train_summary_steps=0 = summaries disabled (reference
            # run.py:82-84, used by the flagship ImageNet recipes to avoid
            # host fetches).
            if config.train_summary_steps > 0 and (
                    cur_step % config.train_summary_steps < done
                    or cur_step >= total_steps):
                fetched = logger.log(cur_step, metrics)
                if ips:
                    logger.log(cur_step, {"train/images_per_sec": ips})
                # Image summaries (tf2/run.py:572-576): the reference logs
                # the first AUGMENTED view — that comes out of the jitted
                # step as a small slice of the actual model inputs; the raw
                # host canvas is logged alongside for before/after debugging.
                if aug_views is not None:
                    logger.log_images(cur_step, aug_views, tag="augmented_views")
                logger.log_images(cur_step, last_images)
                log.info("step %d/%d loss=%.4f ips=%s", cur_step, total_steps,
                         fetched.get("train/total_loss", float("nan")),
                         f"{ips:.1f}" if ips else "n/a")
            # ONE synchronized read per boundary: a SIGTERM landing between
            # two separate reads could exit the loop without saving; a
            # per-process read could split a multi-process job across the
            # boundary (one side in a collective save, the other in the next
            # train step — mismatched collectives hang everyone).
            preempted = guard.sync()
            if (cur_step % checkpoint_steps < done or cur_step >= total_steps
                    or preempted):
                # Async save: serialization overlaps the next train loop; the
                # end-of-training wait below guarantees durability before exit.
                ckpt_lib.save(manager, state, wait=False)
            if preempted:
                log.warning("SIGTERM received: checkpoint saved at step %d, "
                            "exiting train loop (resume-latest continues here)",
                            cur_step)
                break
    finally:
        # An exception mid-step must not abandon an in-flight async save
        # (durability the old synchronous save semantics guaranteed), leak
        # the SIGTERM handler into the caller, or leave the TB writer open.
        manager.wait_until_finished()
        guard.uninstall()
        logger.close()
    log.info("training done in %.1fs", time.time() - t_start)
    return state


def evaluate(config: Config, state: Optional[TrainState] = None,
             checkpoint_step: Optional[int] = None) -> dict:
    """Single evaluation pass (tf2/run.py:348-432)."""
    assert config.model_dir, "--model_dir is required"
    compilation_cache.maybe_enable(config)
    mesh = mesh_lib.create_mesh(config)
    ds, info = build_dataset(config, is_training=False)
    model, tx, lr_fn = build_model_and_optimizer(
        config, max(info.num_train_examples, 1), info.num_classes, mesh=mesh)

    if state is None:
        state = init_state(config, model, tx, mesh, info.image_shape)
        manager = ckpt_lib.create_manager(config.model_dir, config.keep_checkpoint_max)
        if manager.latest_step() is not None:
            state = ckpt_lib.restore(manager, state, checkpoint_step)
        elif config.checkpoint:
            state = ckpt_lib.warm_start(config, state, config.checkpoint)

    eval_step = jax.jit(make_eval_step(
        config, model, host_preprocessed=info.eval_host_preprocessed))

    sums = {}
    num_seen = 0
    num_batches = 0
    target = info.num_eval_examples
    if config.eval_steps:
        target = min(target, config.eval_steps * config.eval_batch_size)
    for batch in ds:
        # Mask out padded rows of the final batch (TF1 pad_to_batch parity,
        # data.py:31-100).
        bs_local = len(batch["label"])
        bs_global = bs_local * jax.process_count()
        if "index" in batch:
            # Exact path: loaders tag every row with its GLOBAL example
            # index (pad/filler rows carry num_examples), so the mask is
            # exact under any sharding pattern — contiguous slices,
            # tf.data round-robin shards, and ragged final shards alike.
            mask = (batch["index"] < target).astype(np.float32)
            batch = {k: v for k, v in batch.items() if k != "index"}
            batch = dict(batch, mask=mask)
            remaining = target - num_seen  # round accounting only
        else:
            if jax.process_count() > 1:
                # Positional masks assume contiguous per-process slices; a
                # loader with any other sharding pattern (e.g. strided) would
                # be silently misattributed.  Every first-tier loader tags
                # indices — an index-less batch here is a loader bug, not a
                # degraded mode.
                raise ValueError(
                    "multi-process eval requires global 'index' tags on every "
                    f"batch; the {type(ds).__name__} loader "
                    f"(--input_pipeline={config.input_pipeline}) yielded an "
                    "index-less batch")
            remaining = target - num_seen
            # Single process: rows are stream-ordered, so the mask is
            # positional.
            mask = (np.arange(bs_local) < remaining).astype(np.float32)
            batch = dict(batch, mask=mask)
        out = jax.device_get(eval_step(state, _put_batch(batch, mesh)))
        for k, v in out.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        num_seen += int(min(remaining, bs_global))
        num_batches += 1
        if num_seen >= target:
            break

    count = max(sums.get("eval/label_count", num_seen), 1.0)
    result = {
        "eval/label_top_1_accuracy": sums.get("eval/label_top_1_sum", 0.0) / count,
        "eval/label_top_5_accuracy": sums.get("eval/label_top_5_sum", 0.0) / count,
        "eval/supervised_loss": sums.get("eval/sup_loss_sum", 0.0) / count,
        # Per-batch constant of the params: mean over batches, not sum.
        "eval/regularization_loss": (
            sums.get("eval/regularization_loss", 0.0) / max(num_batches, 1)
        ),
    }
    if "eval/contrastive_top_1_sum" in sums:  # TF1 pretrain-eval parity
        ccount = max(sums.get("eval/contrastive_count", count), 1.0)
        result["eval/contrast_top_1_accuracy"] = sums["eval/contrastive_top_1_sum"] / ccount
        result["eval/contrast_top_5_accuracy"] = sums.get("eval/contrastive_top_5_sum", 0.0) / ccount
        result["eval/contrast_loss"] = sums.get("eval/contrast_loss_sum", 0.0) / ccount
    step = int(jax.device_get(state.step))
    write_result_json(config.model_dir, result, step)
    # Eval summaries live under model_dir/eval[_<eval_name>] — the TF
    # estimator namespaces eval summary folders by evaluate(name=...)
    # (run.py:326-327), which is how parallel evals (e.g. different splits)
    # keep separate TensorBoard curves.
    eval_dir = os.path.join(
        config.model_dir,
        "eval" + (f"_{config.eval_name}" if config.eval_name else ""))
    eval_logger = MetricLogger(eval_dir)
    eval_logger.log(step, result)
    eval_logger.close()
    config.save(config.model_dir)
    # Export the serving bundle at eval time like the reference
    # (run.py:354-360 hub export inside perform_evaluation).
    try:
        from simclr_tpu.export import export_serving, export_tf_savedmodel

        bundle = export_serving(config, state, info.num_classes)
        if config.export_tf_savedmodel:
            # TF-ecosystem artifact for the colabs / Hub consumers
            # (tf2/run.py:241-305); opt-in, needs tensorflow importable.
            export_tf_savedmodel(bundle)
        if config.export_stablehlo:
            # XLA-native serving artifact (jax.export IR, no Python model
            # code needed to serve it).
            from simclr_tpu.export import export_stablehlo

            export_stablehlo(bundle)
    except Exception as e:  # export must not break eval
        log.warning("serving export failed: %s", e)
    log.info("eval @ step %d: %s", step, result)
    return result


def continuous_eval(config: Config, min_interval_secs: int = 15):
    """Watch model_dir for new checkpoints until train_steps is reached
    (run.py:421-435 checkpoints_iterator semantics)."""
    ds, info = build_dataset(config, is_training=False)
    total_steps = get_train_steps(config, max(info.num_train_examples, 1))
    seen = set()
    while True:
        manager = ckpt_lib.create_manager(config.model_dir, config.keep_checkpoint_max)
        steps = [s for s in (manager.all_steps() or []) if s not in seen]
        for s in sorted(steps):
            try:
                evaluate(config, checkpoint_step=s)
            except FileNotFoundError:
                continue  # checkpoint GC race (run.py:432-433)
            seen.add(s)
            if s >= total_steps:
                return
        time.sleep(min_interval_secs)


def run(config: Config):
    """--mode dispatch (run.py:109-115)."""
    # basicConfig no-ops once absl/TF has installed a root handler (and absl
    # raises the root level), which silences all progress output — attach our
    # own handler explicitly so the CLI always reports.
    if not log.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s: %(message)s"))
        log.addHandler(handler)
        log.setLevel(logging.INFO)
        log.propagate = False
    if config.mode == "train":
        train(config)
    elif config.mode == "eval":
        continuous_eval(config)
    elif config.mode == "train_then_eval":
        state = train(config)
        evaluate(config, state=state)
    else:
        raise ValueError(f"Unknown mode {config.mode}")
