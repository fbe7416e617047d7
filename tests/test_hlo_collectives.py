"""HLO collective-shape regression guards (VERDICT r4 #3).

All nine dryrun segments prove multi-device programs are CORRECT; nothing
until now pinned their communication shape — a wrong sharding decision
(e.g. an accidental all-gather of conv-tower activations) passes every
numeric test and only shows up as a 10x slowdown on real hardware.  These
tests compile the flagship programs on the virtual 8-device mesh
(tests/conftest.py) and assert the collective inventory of the partitioned
HLO:

  * pure DP (the reference's only mode, README.md:109 32-core flagship):
    the conv tower is fully data-parallel — NO activation-shaped (rank>=3)
    collective anywhere; cross-device traffic is exactly the NT-Xent
    embedding gather (<= 2N x proj_dim floats, objective.py:75-124 tile
    structure), label/mask gathers, grad/metric all-reduces.
  * fused NT-Xent island (shard_map): same bound — the island must gather
    (B_local, 128) embeddings, never hidden activations.
  * ghost-BN (--global_bn=false): per-shard statistics must add NO
    cross-device BN traffic — same inventory as global-BN DP minus the BN
    stat reductions (which GSPMD folds into replicated math), still no
    rank>=3 collectives.
  * FSDP: parameter/optimizer sharding must produce grad reduction
    (all-reduce or reduce-scatter) and keep any parameter all-gathers no
    bigger than the largest parameter.
"""

import re

import jax
import numpy as np
import pytest

from simclr_tpu.config import Config
from simclr_tpu.optim.builder import masked, trainable_mask
from simclr_tpu.parallel import mesh as mesh_lib
from simclr_tpu.training import trainer
from simclr_tpu.training.steps import make_train_step

_COLLECTIVE = re.compile(
    r"=\s+(?P<type>\(?[a-z0-9]+\[[^=]*?)\s+"
    r"(?P<op>all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)\(")
_SHAPE = re.compile(r"[a-z0-9]+\[([0-9,]*)\]")


def collective_inventory(hlo_text):
    """[(op, [shape tuples]), ...] for every collective instruction.  Tuple
    ops (fused grad all-reduces) contribute all member shapes."""
    out = []
    for line in hlo_text.splitlines():
        m = _COLLECTIVE.search(line)
        if not m:
            continue
        shapes = [tuple(int(d) for d in s.split(",") if d)
                  for s in _SHAPE.findall(m.group("type"))]
        out.append((m.group("op"), shapes))
    return out


def compile_step(config, mesh=None, **step_kw):
    if mesh is None:
        mesh = mesh_lib.create_mesh(config)
    model, tx, lr_fn = trainer.build_model_and_optimizer(
        config, num_examples=64, num_classes=10, mesh=mesh)
    state = trainer.init_state(config, model, tx, mesh, (32, 32, 3))
    mask = trainable_mask(config, state.params)
    step = make_train_step(config, model, masked(tx, mask), lr_fn, mesh=mesh,
                           **step_kw)
    hw = config.image_size
    batch = {
        "image": np.zeros((config.train_batch_size, hw, hw, 3), np.uint8),
        "label": np.zeros((config.train_batch_size,), np.int32),
    }
    batch = {k: jax.device_put(v, mesh_lib.batch_sharding(mesh))
             for k, v in batch.items()}
    lowered = jax.jit(step, donate_argnums=(0,)).lower(
        state, batch, jax.random.PRNGKey(0))
    return lowered.compile().as_text(), config, state


# Flagship shape (summaries off, like the reference's ImageNet commands —
# run.py:82-84): the step must emit NO image/activation collectives at all.
BASE = dict(dataset="synthetic", num_images_default=64, image_size=32,
            resnet_depth=18, train_batch_size=16, train_steps=1,
            warmup_epochs=0, optimizer="lars", compute_dtype="float32",
            use_blur=True, train_summary_steps=0, model_dir=None)


def _assert_dp_inventory(hlo, config, state, n_dev=8, proj_dim=128):
    inv = collective_inventory(hlo)
    assert inv, "expected collectives in an 8-device program"
    rows = 2 * config.train_batch_size  # 2N global embedding rows
    emb_budget = rows * proj_dim
    param_budget = max(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(state.params))
    # The one sanctioned image-shaped movement: the views-major concat
    # reshard.  Augmentation is batch-parallel per shard, but the model
    # consumes [all view-a; all view-b] rows — re-blocking a (2B) dim-0
    # sharding moves at most half the augmented views between neighbor
    # devices once per step (point-to-point permutes, <0.5% of the flagship
    # step — docs/DESIGN.md 'views-major layout').  RGB images only
    # (channels <= 3); conv-tower FEATURES (C >= 16) stay put.
    img_budget = rows * config.image_size ** 2 * 3
    for op, shapes in inv:
        for shape in shapes:
            # Effective rank: singleton dims don't make an activation (the
            # per-image blur gate travels as pred[B,1,1,1]).
            eff_rank = sum(1 for d in shape if d > 1)
            n_elem = int(np.prod(shape)) if shape else 1
            if op == "all-reduce":
                # Gradient/metric reduction: bounded by the largest single
                # parameter (conv kernels are rank-4 — that's a grad, not an
                # activation).  An all-reduce BIGGER than every param would
                # be a partial-sum activation reduction.
                assert n_elem <= param_budget, (
                    f"all-reduce {shape} exceeds the largest parameter "
                    f"({param_budget} elems) — activation partial-sums in "
                    f"a pure-DP program")
            elif eff_rank >= 3:
                assert shape[-1] <= 3 and n_elem <= img_budget, (
                    f"activation-shaped collective crept into the DP "
                    f"program: {op} {shape} — the conv tower must stay "
                    f"data-parallel (only the raw-image views-major reshard "
                    f"is sanctioned)")
            elif op in ("all-gather", "collective-permute", "all-to-all"):
                assert n_elem <= emb_budget, (
                    f"{op} {shape} moves {n_elem} elements; the largest "
                    f"legitimate gather is the (2N={rows}, {proj_dim}) "
                    f"NT-Xent embedding block = {emb_budget}")
    # Data parallelism requires gradient reduction.
    assert any(op == "all-reduce" for op, _ in inv), "no grad all-reduce"


def test_dp_dense_ntxent_collectives():
    hlo, config, state = compile_step(Config(**BASE))
    _assert_dp_inventory(hlo, config, state)


def test_dp_fused_ntxent_island_collectives():
    from simclr_tpu.ops import ntxent_pallas

    ntxent_pallas._FORCE_INTERPRET = True
    try:
        hlo, config, state = compile_step(
            Config(**BASE).replace(use_fused_ntxent=True))
    finally:
        ntxent_pallas._FORCE_INTERPRET = False
    _assert_dp_inventory(hlo, config, state)


def test_ghost_bn_adds_no_activation_collectives():
    """--global_bn=false (per-shard statistics) must not introduce ANY
    cross-shard BN traffic — its whole point is replica-local stats."""
    hlo, config, state = compile_step(Config(**BASE).replace(global_bn=False))
    _assert_dp_inventory(hlo, config, state)


def test_view_summary_gated_off_reduces_image_collectives():
    """With summaries ENABLED the step additionally gathers a 3-image TB
    slice every step; the flagship's --train_summary_steps=0 must compile
    WITHOUT that extra image traffic (steps.py gating) — only the
    views-major reshard permutes remain."""
    def n_image_collectives(hlo):
        return sum(1 for op, shapes in collective_inventory(hlo)
                   for s in shapes if sum(1 for d in s if d > 1) >= 3)

    hlo_on, _, _ = compile_step(Config(**BASE).replace(train_summary_steps=100))
    hlo_off, config, state = compile_step(Config(**BASE))
    assert n_image_collectives(hlo_off) < n_image_collectives(hlo_on), (
        "summaries off must drop the TB view-summary gather")
    _assert_dp_inventory(hlo_off, config, state)


def test_fsdp_has_grad_reduction_and_bounded_param_gathers():
    config = Config(**BASE).replace(fsdp=True, remat_until_block=2,
                                    width_multiplier=2)
    hlo, config, state = compile_step(config)
    inv = collective_inventory(hlo)
    # ZeRO params: gradient reduction must exist (reduce-scatter, or a
    # sharded/fused all-reduce — XLA's CPU partitioner emits the latter).
    assert any(op in ("reduce-scatter", "all-reduce") for op, _ in inv)
    # No collective moves more than the largest single parameter (the FSDP
    # unit of communication) or the largest activation of this program —
    # a bound that catches a replicated-everything or gather-the-world bug.
    p_max = max(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(state.params))
    views = 2 * config.train_batch_size
    act_max = views * config.image_size ** 2 * 3
    budget = max(p_max, act_max)
    for op, shapes in inv:
        for shape in shapes:
            n_elem = int(np.prod(shape)) if shape else 1
            assert n_elem <= budget, (op, shape, budget)


@pytest.mark.slow
def test_fsdp_flagship_scale_moves_params_not_activations():
    """R50 at the flagship 224² shape under FSDP: every collective must be
    no larger than the largest single parameter (the ZeRO unit of
    communication) — activations stay put.

    This is the scale guard that caught the real bug: without the
    block-boundary activation anchoring (trainer.build_model_and_optimizer
    -> ResNet.act_constraint), GSPMD's solver drifted into partial-sum conv
    partitionings — 86 activation all-reduces of up to 51 MB per step,
    gigabytes of traffic versus ~100 MB of parameters.  Toy shapes
    (test_fsdp_has_grad_reduction...) cannot see this: the drift is
    cost-model- and scale-dependent."""
    config = Config(**BASE).replace(
        image_size=224, resnet_depth=50, train_batch_size=64,
        compute_dtype="bfloat16", fsdp=True, remat_until_block=2)
    hlo, config, state = compile_step(config)
    inv = collective_inventory(hlo)
    p_max = max(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(state.params))
    oversized = [(op, s) for op, shapes in inv for s in shapes
                 if int(np.prod(s)) > p_max]
    assert not oversized, (
        f"collectives larger than the largest parameter ({p_max} elems) "
        f"in the FSDP flagship program: {oversized[:5]}")
    assert any(op == "all-reduce" for op, _ in inv)  # grad reduction
    assert any(op == "all-gather" for op, _ in inv)  # ZeRO param gathers


def test_tensor_parallel_confines_rank4_traffic_to_model_axis():
    """data x model mesh: activation re-layout collectives are expected, but
    they must ride the 2-wide 'model' axis (replica groups of size 2), never
    the full 8-device mesh."""
    config = Config(**BASE).replace(mesh_shape="4,2", width_multiplier=2)
    mesh = mesh_lib.create_mesh(config)
    hlo, config, state = compile_step(config, mesh=mesh)
    # Parameter/grad shapes (conv kernels are rank-4): their all-reduce is
    # the DP grad reduction riding the 4-wide data axis — not activation
    # traffic.  TP shards output channels, so a sharded kernel's grad shape
    # is the full shape with C_out divided by the model-axis width (2).
    param_shapes = set()
    for p in jax.tree_util.tree_leaves(state.params):
        param_shapes.add(tuple(p.shape))
        if p.ndim >= 1 and p.shape[-1] % 2 == 0:
            param_shapes.add(tuple(p.shape[:-1]) + (p.shape[-1] // 2,))
    # Two replica_groups syntaxes: explicit {{0,1},{2,3}} and iota
    # [groups,size]<=[4,2]T(1,0).
    explicit_re = re.compile(r"replica_groups=\{(\{[^}]*\}(?:,\{[^}]*\})*)\}")
    iota_re = re.compile(r"replica_groups=\[(\d+),(\d+)\]<=")
    for line in hlo.splitlines():
        m = _COLLECTIVE.search(line)
        if not m:
            continue
        shapes = [tuple(int(d) for d in s.split(",") if d)
                  for s in _SHAPE.findall(m.group("type"))]
        feature_shaped = [s for s in shapes
                          if sum(1 for d in s if d > 1) >= 3 and s[-1] > 3
                          and s not in param_shapes]
        if not feature_shaped:
            # raw-image views reshard (C<=3) rides any axis; param-shaped
            # all-reduces are the data-axis grad reduction
            continue
        e, i = explicit_re.search(line), iota_re.search(line)
        assert e or i, f"feature collective without replica_groups: {line[:200]}"
        if e:
            sizes = {len(grp.split(",")) for grp in
                     re.findall(r"\{([^}]*)\}", e.group(1))}
        else:
            sizes = {int(i.group(2))}
        assert sizes == {2}, (
            f"feature collective {feature_shaped} spans groups of {sizes} "
            f"devices (want model-axis pairs): {line[:200]}")
