"""Jitted train / eval step functions.

Re-design of the reference step logic (tf2/run.py:557-622 single_step,
model.py:37-160 model_fn) as pure functions over a TrainState.  Everything —
the two-view augmentation, forward/backward, NT-Xent with its global
negatives, LARS update — is one fused XLA program per step.  Under a
batch-sharded jit the partitioner inserts the gradient psum (reference
CrossShardOptimizer, model_util.py:104-105), the BN-stat psum
(resnet.py:62-85) and the NT-Xent all-gather (objective.py:91-124) over the
mesh 'data' axis automatically.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax

from simclr_tpu.config import Config
from simclr_tpu.objectives import ntxent
from simclr_tpu.ops import augment
from simclr_tpu.optim.builder import add_weight_decay
from simclr_tpu.training.state import TrainState


def topk_accuracy_sums(logits, labels_idx, mask, ks=(1, 5)):
    """Summed top-k correctness over valid rows (reference metric_fn recall@k,
    model.py:191-217).  Returns dict of sums plus valid count."""
    out = {}
    k_max = max(ks)
    k_max = min(k_max, logits.shape[-1])
    _, top_idx = jax.lax.top_k(logits, k_max)  # (B, k_max)
    hit = top_idx == labels_idx[:, None]
    for k in ks:
        kk = min(k, k_max)
        correct = jnp.any(hit[:, :kk], axis=-1).astype(jnp.float32)
        out[f"top_{k}_sum"] = jnp.sum(correct * mask)
    out["count"] = jnp.sum(mask)
    return out


# Reserved metrics key carrying a small slice of the actual AUGMENTED
# training inputs out of the step for TensorBoard image summaries
# (tf2/run.py:572-576 logs the first augmented view; VERDICT r2 #5).  The
# trainer pops it before scalar logging; make_multi_step carries the last
# step's value instead of averaging.
VIEW_SUMMARY_KEY = "summary/augmented_views"
_VIEW_SUMMARY_N = 3


def _view_summary(images, pretrain: bool):
    """First few augmented inputs, both views when pretraining: rows
    [0, n) are view a and, stacked after them, rows [B, B+n) view b."""
    n = min(_VIEW_SUMMARY_N, images.shape[0] // (2 if pretrain else 1))
    view = images[:n]
    if pretrain:
        b = images.shape[0] // 2
        view = jnp.concatenate(
            [view, jax.lax.dynamic_slice_in_dim(images, b, n, 0)], axis=0)
    return jnp.clip(view.astype(jnp.float32), 0.0, 1.0)


def _resolve_fused(config: Config, mesh=None) -> bool:
    """Tri-state --use_fused_ntxent -> bool.  The trainer passes a resolved
    bool; direct step-builder callers (bench, tests, __graft_entry__) may
    pass 'auto', which must NOT be treated as truthy.

    The island shards its row block over the BATCH mesh axes only, so the
    'auto' tile divisor is num_batch_shards(mesh) — mesh.size would
    under-size the tile on meshes with a model/spatial axis and wrongly
    disable the kernel in its measured-win regime."""
    v = config.use_fused_ntxent
    if isinstance(v, bool):
        return v
    from simclr_tpu.config import resolve_use_fused_ntxent

    if mesh is not None:
        from simclr_tpu.parallel import mesh as mesh_lib

        n = mesh_lib.num_batch_shards(mesh)
    else:
        n = jax.device_count()
    return resolve_use_fused_ntxent(config, n)


def make_train_step(config: Config, model, tx: optax.GradientTransformation,
                    lr_fn: Callable, mesh=None,
                    pre_augmented: bool = False,
                    host_cropped: bool = False,
                    color_impl: str = None) -> Callable:
    """Build the jittable train step: (state, batch, base_rng) -> (state, metrics).

    batch: {'image': uint8 (B, H0, W0, 3) global, 'label': int32 (B,)}.

    ``mesh``: the device mesh the step will be jitted over.  Needed by the
    Pallas paths — fused NT-Xent and the fused crop+color kernel — which
    drop into shard_map islands over the mesh's batch axes (the GSPMD
    partitioner cannot shard a pallas_call; without the island it would
    all-gather and re-augment the full global batch on every chip);
    everything else is partitioner-propagated from the batch sharding.
    ``mesh=None`` keeps single-shard fused semantics.

    ``pre_augmented``: --device_augment=false — the loader already ran the
    augmentation on host (data/host_augment.py); batch['image'] is the
    float (2B views / B, H, W, 3) model input and the step applies none.

    ``host_cropped``: the loader sampled + resampled the distorted crops at
    original source resolution (--host_crop_full_res, full pixel fidelity);
    batch['image'] is (B, 2, H, W, 3) pretrain / (B, H, W, 3) finetune and
    the device stage applies flip/color/blur only.

    ``color_impl``: force the augmentation backend (None = auto: fused
    Pallas on TPU, XLA elsewhere; "xla" | "pallas") — bench.py step-level
    A/Bs thread this down so the toggle is honest on TPU.
    """
    pretrain = config.train_mode == "pretrain"
    h = w = config.image_size
    use_fused_ntxent = _resolve_fused(config, mesh)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], base_rng):
        rng = jax.random.fold_in(base_rng, state.step)
        k_aug = jax.random.fold_in(rng, 0)

        images = batch["image"]
        labels = batch["label"]

        aug_dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else None
        valid_hw = batch.get("valid_hw")  # letterboxed canvas valid region
        if pre_augmented:
            images = images.astype(jnp.float32)
            sup_label_idx = (jnp.concatenate([labels, labels], axis=0)
                             if pretrain else labels)
        elif pretrain:
            if images.dtype != jnp.uint8:
                images = images.astype(jnp.float32) / 255.0
            # Two augmented views, on device (tf2/data.py:52-62 + model
            # blur); uint8 canvases go to two_view raw — the fused Pallas
            # path converts /255 per plane in VMEM, never materializing a
            # float canvas in HBM (the XLA path converts inside two_view).
            images = augment.two_view_pretrain_batch(
                images, k_aug, h, w,
                color_jitter_strength=config.color_jitter_strength,
                use_blur=config.use_blur, dtype=aug_dtype, valid_hw=valid_hw,
                host_cropped=host_cropped, color_impl=color_impl,
                mesh=mesh,
            )
            # Supervised head sees both views: labels doubled
            # (tf2/run.py:596-601).
            sup_label_idx = jnp.concatenate([labels, labels], axis=0)
        else:
            images = images.astype(jnp.float32) / 255.0
            # Finetune: single view, crop+flip but no color jitter
            # (tf2/data.py:101-115: jitter strength 0 for finetune);
            # host-cropped batches skip the crop (already full-fidelity).
            images = augment.preprocess_for_train(
                images, k_aug, h, w, color_jitter_strength=0.0,
                valid_hw=valid_hw, crop=not host_cropped,
                color_impl=color_impl, mesh=mesh,
            )
            sup_label_idx = labels

        if mesh is not None and "spatial" in mesh.axis_names:
            # --spatial_partition: shard the image HEIGHT over the 'spatial'
            # mesh axis.  The constraint sits between the (batch-parallel)
            # augmentation and the encoder, so every conv in the tower runs
            # spatially partitioned — GSPMD inserts the halo exchanges for
            # the kernel overlaps and the psums for the (B,H,W) BN
            # reductions automatically (scaling-book spatial-partitioning
            # recipe; nothing like it exists in the reference).
            from jax.sharding import NamedSharding, PartitionSpec as P

            from simclr_tpu.parallel import mesh as mesh_lib

            images = jax.lax.with_sharding_constraint(
                images, NamedSharding(
                    mesh, P(mesh_lib.batch_axes(mesh), "spatial")))

        def loss_fn(params):
            (proj, logits_sup), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            metrics = {}
            loss = jnp.zeros([], jnp.float32)
            if pretrain:
                if use_fused_ntxent:
                    from simclr_tpu.ops.ntxent_pallas import (
                        ntxent_fused_metrics_gspmd,
                    )

                    con_loss, con_acc, con_ent = ntxent_fused_metrics_gspmd(
                        proj, config.hidden_norm, config.temperature, mesh)
                    metrics["train/contrast_acc"] = con_acc
                    metrics["train/contrast_entropy"] = con_ent
                else:
                    con_loss, logits_ab, con_labels = ntxent.add_contrastive_loss(
                        proj, hidden_norm=config.hidden_norm,
                        temperature=config.temperature,
                    )
                    metrics["train/contrast_acc"] = ntxent.contrastive_accuracy(logits_ab, con_labels)
                    metrics["train/contrast_entropy"] = ntxent.contrastive_entropy(logits_ab)
                metrics["train/contrast_loss"] = con_loss
                loss += con_loss
            if logits_sup is not None:
                num_classes = logits_sup.shape[-1]
                sup_labels = jax.nn.one_hot(sup_label_idx, num_classes)
                sup_loss = ntxent.add_supervised_loss(sup_labels, logits_sup)
                loss += sup_loss
                metrics["train/supervised_loss"] = sup_loss
                metrics["train/supervised_acc"] = jnp.mean(
                    (jnp.argmax(logits_sup, -1) == sup_label_idx).astype(jnp.float32)
                )
            wd_loss = add_weight_decay(config, params)
            loss += wd_loss
            metrics["train/weight_decay"] = wd_loss
            metrics["train/total_loss"] = loss
            return loss, (mutated["batch_stats"], metrics)

        grads, (new_batch_stats, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["learning_rate"] = lr_fn(state.step)
        if config.train_summary_steps > 0:
            # Summaries disabled (the flagship recipes set 0, run.py:82-84)
            # must not pay for the slice: under GSPMD it compiles to a real
            # per-step image all-gather + permutes on the batch axis.
            metrics[VIEW_SUMMARY_KEY] = _view_summary(images, pretrain)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step


def make_shard_map_train_step(config: Config, model, tx: optax.GradientTransformation,
                              lr_fn: Callable, mesh,
                              host_cropped: bool = False) -> Callable:
    """Explicit-SPMD train step via jax.shard_map over the mesh 'data' axis.

    The alternative to the GSPMD path: per-replica code with explicit
    collectives, matching the reference's replica-context programming model
    (tf2/run.py:557-622).  Supports --global_bn=False (per-replica batch
    statistics, moving averages pmean-merged so replicas stay consistent) —
    which GSPMD cannot express.  NT-Xent gathers negatives with
    lax.all_gather and replica-offset labels (objective.py:59-68);
    gradients/metrics are pmean'd (CrossShardOptimizer semantics,
    model_util.py:104-105).

    The model must be built with axis_name='data'
    (SimCLRModel.from_config(..., axis_name='data')).
    """
    from jax.sharding import PartitionSpec as P

    pretrain = config.train_mode == "pretrain"
    h = w = config.image_size
    use_fused_ntxent = _resolve_fused(config, mesh)

    def local_step(state: TrainState, batch, base_rng):
        replica = jax.lax.axis_index("data")
        rng = jax.random.fold_in(jax.random.fold_in(base_rng, state.step), replica)
        k_aug = jax.random.fold_in(rng, 0)

        images = batch["image"]
        labels = batch["label"]
        aug_dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else None
        valid_hw = batch.get("valid_hw")
        if not (pretrain and images.dtype == jnp.uint8):
            images = images.astype(jnp.float32) / 255.0
        if pretrain:
            images = augment.two_view_pretrain_batch(
                images, k_aug, h, w,
                color_jitter_strength=config.color_jitter_strength,
                use_blur=config.use_blur, dtype=aug_dtype, valid_hw=valid_hw,
                host_cropped=host_cropped,
            )
            sup_label_idx = jnp.concatenate([labels, labels], axis=0)
        else:
            images = augment.preprocess_for_train(images, k_aug, h, w, 0.0,
                                                  valid_hw=valid_hw,
                                                  crop=not host_cropped)
            sup_label_idx = labels

        def loss_fn(params):
            (proj, logits_sup), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            metrics = {}
            loss = jnp.zeros([], jnp.float32)
            if pretrain:
                if use_fused_ntxent:
                    # Fused streaming kernel over the local (rows x global)
                    # tile: all_gather inside, column-grad psum in the VJP
                    # (SURVEY.md N1 fused all-gather NT-Xent).
                    from simclr_tpu.ops.ntxent_pallas import ntxent_fused_metrics

                    con_loss, con_acc, con_ent = ntxent_fused_metrics(
                        proj, config.hidden_norm, config.temperature, "data")
                else:
                    con_loss, logits_ab, con_labels = ntxent.add_contrastive_loss(
                        proj, hidden_norm=config.hidden_norm,
                        temperature=config.temperature, axis_name="data",
                    )
                    con_acc = ntxent.contrastive_accuracy(logits_ab, con_labels)
                    con_ent = ntxent.contrastive_entropy(logits_ab)
                loss += con_loss
                metrics["train/contrast_loss"] = con_loss
                metrics["train/contrast_acc"] = con_acc
                metrics["train/contrast_entropy"] = con_ent
            if logits_sup is not None:
                sup_labels = jax.nn.one_hot(sup_label_idx, logits_sup.shape[-1])
                sup_loss = ntxent.add_supervised_loss(sup_labels, logits_sup)
                loss += sup_loss
                metrics["train/supervised_loss"] = sup_loss
            wd_loss = add_weight_decay(config, params)
            loss += wd_loss
            metrics["train/weight_decay"] = wd_loss
            metrics["train/total_loss"] = loss
            return loss, (mutated["batch_stats"], metrics)

        grads, (new_batch_stats, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, "data")
        # Per-replica moving statistics merged so replicas stay identical
        # (with --global_bn the stats are already equal; pmean is a no-op).
        new_batch_stats = jax.lax.pmean(new_batch_stats, "data")
        metrics = jax.lax.pmean(metrics, "data")
        if config.train_summary_steps > 0:
            # Augmented-view summary must bypass the metric pmean: take
            # replica 0's slice and replicate it (zero elsewhere + psum).
            # Gated like the GSPMD path: summaries off = no image collective.
            view = _view_summary(images, pretrain)
            view = jnp.where(jax.lax.axis_index("data") == 0, view, 0.0)
            metrics[VIEW_SUMMARY_KEY] = jax.lax.psum(view, "data")

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["learning_rate"] = lr_fn(state.step)
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_batch_stats, opt_state=new_opt_state,
        )
        return new_state, metrics

    state_specs = P()  # replicated state
    return jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(state_specs, P("data"), P()),
        out_specs=(state_specs, P()),
        check_vma=False,
    )


def make_multi_step(train_step: Callable, steps: int) -> Callable:
    """Device-side loop of ``steps`` train steps via lax.scan over stacked
    batches (leaves shaped (steps, B, ...)).

    The reference amortizes host round-trips with iterations_per_loop
    (run.py:405) / an inner tf.range loop (tf2/run.py:626-638); this is the
    XLA-native equivalent — one compiled program, one dispatch, ``steps``
    fused step iterations.  Returns (state, loop-mean metrics) — the
    reference accumulates keras metric means across the inner loop
    (tf2/run.py:534-549), so loss curves are means over the loop, not
    1-in-``steps`` samples; the learning rate reports the last step's value.
    """

    def multi_step(state, batches, base_rng):
        # Non-scalar metrics (the augmented-view image summary) are carried
        # through the scan — last step's value — instead of being stacked
        # over all ``steps`` iterations and averaged (stacking spl x views
        # would stage tens of MB per loop for a summary image).
        first = jax.tree.map(lambda x: x[0], batches)
        _, m_shapes = jax.eval_shape(train_step, state, first, base_rng)
        img_keys = tuple(sorted(k for k, v in m_shapes.items() if v.ndim > 0))
        init_imgs = {k: jnp.zeros(m_shapes[k].shape, m_shapes[k].dtype)
                     for k in img_keys}

        def body(carry, batch):
            st, _ = carry
            st, metrics = train_step(st, batch, base_rng)
            imgs = {k: metrics.pop(k) for k in img_keys}
            return (st, imgs), metrics

        (state, imgs), metrics_seq = jax.lax.scan(body, (state, init_imgs), batches)
        out = jax.tree.map(lambda x: jnp.mean(x, axis=0), metrics_seq)
        if "learning_rate" in out:
            out["learning_rate"] = metrics_seq["learning_rate"][-1]
        out.update(imgs)
        return state, out

    return multi_step


def make_eval_step(config: Config, model, host_preprocessed: bool = False) -> Callable:
    """Eval step: center-crop preprocess + forward + top-1/top-5 sums
    (tf2/run.py:348-398; padded rows masked like TF1 model.py:191-206).

    ``host_preprocessed``: the loader already applied the reference eval
    center-crop at ORIGINAL resolution (variable-size sources) — skip the
    device crop."""
    h = w = config.image_size
    test_crop = config.image_size > 32  # data.py:152-165: no test crop <=32px

    pretrain = config.train_mode == "pretrain"

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        images = batch["image"].astype(jnp.float32) / 255.0
        if not host_preprocessed:
            images = augment.preprocess_for_eval(images, h, w, crop=test_crop)
        labels = batch["label"]
        mask = batch.get("mask", jnp.ones_like(labels, jnp.float32))
        b = images.shape[0]

        if pretrain:
            # TF1 pretrain-eval feeds the two (deterministic, identical) eval
            # views and reports contrastive metrics too (data.py:122-126,
            # model.py:201-205).
            images = jnp.concatenate([images, images], axis=0)

        proj, logits_sup = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False,
        )
        out = {}
        if pretrain:
            # Padded rows are masked out of the contrastive loss entirely
            # (excluded from the mean and from every row's negatives), so the
            # final partial batch is unbiased (TF1 masked metric_fn,
            # model.py:191-206).
            con_loss, logits_ab, con_labels = ntxent.add_contrastive_loss(
                proj, hidden_norm=config.hidden_norm,
                temperature=config.temperature, weights=mask,
            )
            con_idx = jnp.argmax(con_labels[:, : logits_ab.shape[1]], axis=1)
            csums = topk_accuracy_sums(logits_ab, con_idx, mask)
            out.update({f"eval/contrastive_{k}": v for k, v in csums.items()})
            out["eval/contrast_loss_sum"] = con_loss * jnp.sum(mask)
        if logits_sup is not None:
            logits_sup = logits_sup[:b]  # first view's logits for label metrics
            sums = topk_accuracy_sums(logits_sup, labels, mask)
            out.update({f"eval/label_{k}": v for k, v in sums.items()})
            num_classes = logits_sup.shape[-1]
            one_hot = jax.nn.one_hot(labels, num_classes)
            logp = jax.nn.log_softmax(logits_sup, axis=-1)
            out["eval/sup_loss_sum"] = jnp.sum(-jnp.sum(one_hot * logp, -1) * mask)
        out["eval/regularization_loss"] = add_weight_decay(config, state.params)
        return out

    return eval_step
