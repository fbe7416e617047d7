"""Fused NT-Xent Pallas kernels (TPU) with custom VJP + SPMD integration.

The reference materializes four (local x global) logits matrices plus their
concatenations and feeds tf softmax-CE (objective.py:75-88).  At SimCLR
scale (global batch 4096 => 8192 embeddings) that is 8192 x 16384 fp32 live
in HBM for forward and again for backward.  These kernels stream column
tiles of the similarity matrix flash-attention-style: one pass computes the
row-wise logsumexp online plus the positive logit, so the loss is produced
without ever materializing logits; the backward pass recomputes tiles and
accumulates embedding gradients directly.  HBM traffic drops from
O(B * N_total) logits to O(B * D) embeddings.

The kernels are **rectangular**: queries are the local row block
(b_local, d), keys are the gathered global batch (b_global, d), and a scalar
``row_offset`` places the self-mask / positive diagonal — exactly the
reference's per-replica (local x global) tile structure with replica-offset
labels (objective.py:64-80).  This is what lets the fused loss ride the
shard_map path: ``lax.all_gather`` the normalized embeddings over the mesh
axis, run the kernel on local rows, and ``psum`` the column-gradient block
in the backward (the same collective the dense path's all_gather transpose
inserts).

Metrics come from kernel byproducts: the positive logit and the ab-block
max give contrastive accuracy, and the ab-block online (lse, E[logit])
pair gives the softmax entropy — no dense logits needed
(reference metrics: tf2/run.py:534-549).

Public surface:
  * ``ntxent_fused_metrics(hidden, hidden_norm, temperature, axis_name)``
    -> (loss, contrast_acc, contrast_entropy); custom VJP with the
    streaming backward.  ``axis_name`` enables the sharded path inside
    shard_map.
  * ``ntxent_loss_fused(hidden, hidden_norm, temperature)`` — loss-only
    wrapper (kept for compatibility).
  * ``add_contrastive_loss_pallas`` — loss-only forward drop-in.

Validated against the dense reference in interpret mode (CPU) and on
hardware; see tests/test_ntxent_fused.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from simclr_tpu.objectives import ntxent as ntxent_ref

LARGE_NUM = 1e9


def _tiles(b):
    row = min(128, b) if b % min(128, b) == 0 else b
    col = min(512, b) if b % min(512, b) == 0 else b
    return row, col


def _ntxent_pallas_fwd(q1, q2, k1, k2, row_offset, temperature, interpret=False):
    """Streaming forward over the (local x global) tile.

    Returns per-local-row arrays (b_loc, 1):
      loss, m_a, l_a, m_b, l_b   — concat-row logsumexp state (residuals),
      m_ab, l_ab, t_ab           — ab-block-only stats for acc/entropy.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b_loc, d = q1.shape
    b_glob = k1.shape[0]
    ROW_TILE, _ = _tiles(b_loc)
    _, COL_TILE = _tiles(b_glob)
    n_row_tiles = b_loc // ROW_TILE
    n_col_tiles = b_glob // COL_TILE

    def kernel(off_ref, q1_ref, q2_ref, k1_ref, k2_ref,
               loss_ref, ma_ref, la_ref, mb_ref, lb_ref,
               mab_ref, lab_ref, tab_ref, aab_ref):
        i = pl.program_id(0)
        row0 = i * ROW_TILE
        q1t = q1_ref[pl.ds(row0, ROW_TILE), :]
        q2t = q2_ref[pl.ds(row0, ROW_TILE), :]

        neg_inf = jnp.full((ROW_TILE, 1), -jnp.inf, jnp.float32)
        zeros = jnp.zeros((ROW_TILE, 1), jnp.float32)
        m_a, m_b, m_ab = neg_inf, neg_inf, neg_inf
        l_a, l_b, l_ab, t_ab = zeros, zeros, zeros, zeros
        p_a, p_b = zeros, zeros
        a_ab = jnp.zeros((ROW_TILE, 1), jnp.int32)  # running argmax col of ab
        row_ids = (off_ref[0] + row0
                   + jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, COL_TILE), 0))

        def col_step(j, carry):
            m_a, l_a, m_b, l_b, p_a, p_b, m_ab, l_ab, t_ab, a_ab = carry
            col0 = j * COL_TILE
            k1t = k1_ref[pl.ds(col0, COL_TILE), :]
            k2t = k2_ref[pl.ds(col0, COL_TILE), :]
            col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, COL_TILE), 1)
            diag = (row_ids == col_ids).astype(jnp.float32)

            s_ab = jnp.dot(q1t, k2t.T, preferred_element_type=jnp.float32) / temperature
            s_aa = jnp.dot(q1t, k1t.T, preferred_element_type=jnp.float32) / temperature - diag * LARGE_NUM
            s_ba = jnp.dot(q2t, k1t.T, preferred_element_type=jnp.float32) / temperature
            s_bb = jnp.dot(q2t, k2t.T, preferred_element_type=jnp.float32) / temperature - diag * LARGE_NUM
            p_a = p_a + jnp.sum(s_ab * diag, axis=1, keepdims=True)
            p_b = p_b + jnp.sum(s_ba * diag, axis=1, keepdims=True)

            def lse_update(m, l, s):
                tile_max = jnp.maximum(jnp.max(s, axis=1, keepdims=True), m)
                l = l * jnp.exp(m - tile_max) + jnp.sum(jnp.exp(s - tile_max), axis=1, keepdims=True)
                return tile_max, l

            m_a, l_a = lse_update(*lse_update(m_a, l_a, s_ab), s_aa)
            m_b, l_b = lse_update(*lse_update(m_b, l_b, s_ba), s_bb)

            # ab-block-only stats: online (max, argmax, sum e^s, sum e^s * s)
            # giving the ab softmax's argmax/lse/expected logit for the
            # acc/entropy metrics.  Strict > keeps the FIRST maximal column,
            # matching jnp.argmax tie-breaking on the dense logits.
            tile_max = jnp.max(s_ab, axis=1, keepdims=True)
            tile_arg = col0 + jnp.argmax(s_ab, axis=1).astype(jnp.int32)[:, None]
            a_ab = jnp.where(tile_max > m_ab, tile_arg, a_ab)
            new_m = jnp.maximum(tile_max, m_ab)
            alpha = jnp.exp(m_ab - new_m)
            e = jnp.exp(s_ab - new_m)
            l_ab = l_ab * alpha + jnp.sum(e, axis=1, keepdims=True)
            t_ab = t_ab * alpha + jnp.sum(e * s_ab, axis=1, keepdims=True)
            m_ab = new_m
            return m_a, l_a, m_b, l_b, p_a, p_b, m_ab, l_ab, t_ab, a_ab

        m_a, l_a, m_b, l_b, p_a, p_b, m_ab, l_ab, t_ab, a_ab = jax.lax.fori_loop(
            0, n_col_tiles, col_step,
            (m_a, l_a, m_b, l_b, p_a, p_b, m_ab, l_ab, t_ab, a_ab),
        )
        sl = pl.ds(row0, ROW_TILE)
        loss_ref[sl, :] = (m_a + jnp.log(l_a) - p_a) + (m_b + jnp.log(l_b) - p_b)
        ma_ref[sl, :] = m_a
        la_ref[sl, :] = l_a
        mb_ref[sl, :] = m_b
        lb_ref[sl, :] = l_b
        mab_ref[sl, :] = m_ab
        lab_ref[sl, :] = l_ab
        tab_ref[sl, :] = t_ab
        aab_ref[sl, :] = a_ab

    out = [jax.ShapeDtypeStruct((b_loc, 1), jnp.float32) for _ in range(8)]
    out.append(jax.ShapeDtypeStruct((b_loc, 1), jnp.int32))
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(9)]
    return pl.pallas_call(
        kernel,
        out_shape=tuple(out),
        grid=(n_row_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=tuple(specs),
        interpret=interpret,
    )(jnp.asarray(row_offset, jnp.int32).reshape(1), q1, q2, k1, k2)


def _ntxent_pallas_bwd(q1, q2, k1, k2, row_offset, m_a, l_a, m_b, l_b,
                       temperature, interpret=False):
    """Streaming backward over recomputed probability tiles.

    With P_ab/P_aa = row-softmax of [s_ab|s_aa] (direction a) and P_ba/P_bb
    (direction b) over the per-row-SUM losses (caller applies g/B and the
    L2-normalization backward):
      row path  (grad wrt queries):  dq1 = [P_ab @ k2 + P_aa @ k1 - pos2] / T
      col path  (grad wrt keys):     dk1 = [P_aa^T @ q1 + P_ba^T @ q2 - pos2] / T
    where the positive-pair identity terms are folded outside the kernel.
    Returns (dq1, dq2) of shape (b_loc, d) and (dk1, dk2) of shape
    (b_glob, d); the caller psums dk over replicas and adds the local block.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b_loc, d = q1.shape
    b_glob = k1.shape[0]
    ROW_TILE, _ = _tiles(b_loc)
    _, COL_TILE = _tiles(b_glob)
    n_row_tiles = b_loc // ROW_TILE
    n_col_tiles = b_glob // COL_TILE

    def kernel(off_ref, q1_ref, q2_ref, k1_ref, k2_ref,
               ma_ref, la_ref, mb_ref, lb_ref,
               dq1_ref, dq2_ref, dk1_ref, dk2_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dk1_ref[...] = jnp.zeros_like(dk1_ref)
            dk2_ref[...] = jnp.zeros_like(dk2_ref)

        row0 = i * ROW_TILE
        q1t = q1_ref[pl.ds(row0, ROW_TILE), :]
        q2t = q2_ref[pl.ds(row0, ROW_TILE), :]
        m_a = ma_ref[pl.ds(row0, ROW_TILE), :]
        l_a = la_ref[pl.ds(row0, ROW_TILE), :]
        m_b = mb_ref[pl.ds(row0, ROW_TILE), :]
        l_b = lb_ref[pl.ds(row0, ROW_TILE), :]
        row_ids = (off_ref[0] + row0
                   + jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, COL_TILE), 0))

        dq1 = jnp.zeros((ROW_TILE, d), jnp.float32)
        dq2 = jnp.zeros((ROW_TILE, d), jnp.float32)

        def col_step(j, carry):
            dq1, dq2 = carry
            col0 = j * COL_TILE
            k1t = k1_ref[pl.ds(col0, COL_TILE), :]
            k2t = k2_ref[pl.ds(col0, COL_TILE), :]
            col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, COL_TILE), 1)
            diag = (row_ids == col_ids).astype(jnp.float32)

            s_ab = jnp.dot(q1t, k2t.T, preferred_element_type=jnp.float32) / temperature
            s_aa = jnp.dot(q1t, k1t.T, preferred_element_type=jnp.float32) / temperature - diag * LARGE_NUM
            s_ba = jnp.dot(q2t, k1t.T, preferred_element_type=jnp.float32) / temperature
            s_bb = jnp.dot(q2t, k2t.T, preferred_element_type=jnp.float32) / temperature - diag * LARGE_NUM

            p_ab = jnp.exp(s_ab - m_a) / l_a
            p_aa = jnp.exp(s_aa - m_a) / l_a
            p_ba = jnp.exp(s_ba - m_b) / l_b
            p_bb = jnp.exp(s_bb - m_b) / l_b

            # row accumulations (grad wrt queries)
            dq1 = dq1 + jnp.dot(p_ab, k2t, preferred_element_type=jnp.float32) \
                      + jnp.dot(p_aa, k1t, preferred_element_type=jnp.float32)
            dq2 = dq2 + jnp.dot(p_ba, k1t, preferred_element_type=jnp.float32) \
                      + jnp.dot(p_bb, k2t, preferred_element_type=jnp.float32)

            # column accumulations (grad wrt keys) into the global outputs
            csl = pl.ds(col0, COL_TILE)
            dk1_ref[csl, :] += (
                jnp.dot(p_aa.T, q1t, preferred_element_type=jnp.float32)
                + jnp.dot(p_ba.T, q2t, preferred_element_type=jnp.float32)
            )
            dk2_ref[csl, :] += (
                jnp.dot(p_ab.T, q1t, preferred_element_type=jnp.float32)
                + jnp.dot(p_bb.T, q2t, preferred_element_type=jnp.float32)
            )
            return dq1, dq2

        dq1, dq2 = jax.lax.fori_loop(0, n_col_tiles, col_step, (dq1, dq2))
        rsl = pl.ds(row0, ROW_TILE)
        dq1_ref[rsl, :] = dq1
        dq2_ref[rsl, :] = dq2

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b_loc, d), jnp.float32),
                   jax.ShapeDtypeStruct((b_loc, d), jnp.float32),
                   jax.ShapeDtypeStruct((b_glob, d), jnp.float32),
                   jax.ShapeDtypeStruct((b_glob, d), jnp.float32)),
        grid=(n_row_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)),
        interpret=interpret,
    )(jnp.asarray(row_offset, jnp.int32).reshape(1), q1, q2, k1, k2,
      m_a, l_a, m_b, l_b)


# Test hook: when True the kernels run through the Pallas interpreter on
# any backend (so the fused path, including its shard_map integration, can
# be validated on the virtual CPU mesh).
_FORCE_INTERPRET = False


def _use_pallas() -> bool:
    return _FORCE_INTERPRET or any(d.platform == "tpu" for d in jax.devices())


def _normalize_with_residual(hidden):
    norm = jnp.linalg.norm(hidden, axis=-1, keepdims=True).clip(1e-12)
    return hidden / norm, norm


def _metrics_from_stats(a_ab, pos_idx, m_ab, l_ab, t_ab):
    """Contrastive accuracy/entropy from ab-block byproducts.

    acc: the streaming argmax column equals the positive column (reference
    contrastive accuracy over logits_ab, argmax tie-breaking included).
    entropy: H = lse_ab - E_p[logit] with lse = m + log l, E_p = t / l."""
    correct = (a_ab[:, 0] == pos_idx).astype(jnp.float32)
    lse = m_ab + jnp.log(l_ab)
    entropy = lse - t_ab / l_ab
    return jnp.mean(correct), jnp.mean(entropy)


def _dense_loss_metrics(hidden, hidden_norm, temperature, axis_name):
    loss, logits_ab, labels = ntxent_ref.add_contrastive_loss(
        hidden, hidden_norm=hidden_norm, temperature=temperature,
        axis_name=axis_name,
    )
    acc = ntxent_ref.contrastive_accuracy(logits_ab, labels)
    ent = ntxent_ref.contrastive_entropy(logits_ab)
    return loss, acc, ent


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def ntxent_fused_metrics(hidden, hidden_norm: bool = True,
                         temperature: float = 1.0, axis_name=None):
    """Fused NT-Xent -> (loss, contrast_acc, contrast_entropy).

    On TPU both forward AND backward stream column tiles of the similarity
    matrix (no (2N)^2 logits ever hit HBM); elsewhere falls back to the
    dense reference math.  With ``axis_name`` (inside shard_map) the
    embeddings are all-gathered over the mesh axis and the kernel computes
    only the local (rows x global) tile; the backward psums the
    column-gradient block — the same collective pattern as the dense
    sharded path (SURVEY.md N1 fused all-gather NT-Xent)."""
    return _dense_loss_metrics(hidden, hidden_norm, temperature, axis_name)


def _gather_keys(hn, axis_name):
    h1, h2 = jnp.split(hn, 2, axis=0)
    if axis_name is None:
        return h1, h2, h1, h2, 0
    k1 = jax.lax.all_gather(h1, axis_name, axis=0, tiled=True)
    k2 = jax.lax.all_gather(h2, axis_name, axis=0, tiled=True)
    off = jax.lax.axis_index(axis_name) * h1.shape[0]
    return h1, h2, k1, k2, off


def _fused_metrics_fwd(hidden, hidden_norm, temperature, axis_name):
    hidden = hidden.astype(jnp.float32)
    if not _use_pallas():
        out = _dense_loss_metrics(hidden, hidden_norm, temperature, axis_name)
        return out, (hidden, None)
    hn, _ = _normalize_with_residual(hidden) if hidden_norm else (hidden, None)
    q1, q2, k1, k2, off = _gather_keys(hn, axis_name)
    loss_vec, m_a, l_a, m_b, l_b, m_ab, l_ab, t_ab, a_ab = _ntxent_pallas_fwd(
        q1, q2, k1, k2, off, temperature, interpret=_FORCE_INTERPRET)
    pos_idx = off + jnp.arange(q1.shape[0], dtype=jnp.int32)
    acc, ent = _metrics_from_stats(a_ab, pos_idx, m_ab, l_ab, t_ab)
    return ((jnp.mean(loss_vec), acc, ent),
            (hidden, (m_a, l_a, m_b, l_b)))


def _fused_metrics_bwd(hidden_norm, temperature, axis_name, residuals, g):
    g_loss = g[0]  # metric cotangents (g[1], g[2]) are not propagated
    hidden, lse_state = residuals
    if lse_state is None:  # dense fallback path
        def f(h):
            loss, _, _ = ntxent_ref.add_contrastive_loss(
                h, hidden_norm=hidden_norm, temperature=temperature,
                axis_name=axis_name,
            )
            return loss

        return (g_loss * jax.grad(f)(hidden),)

    m_a, l_a, m_b, l_b = lse_state
    hn, norm = _normalize_with_residual(hidden) if hidden_norm else (hidden, None)
    q1, q2, k1, k2, off = _gather_keys(hn, axis_name)
    b_loc = q1.shape[0]
    dq1, dq2, dk1, dk2 = _ntxent_pallas_bwd(
        q1, q2, k1, k2, off, m_a, l_a, m_b, l_b, temperature,
        interpret=_FORCE_INTERPRET)
    if axis_name is None:
        dh1 = dq1 + dk1
        dh2 = dq2 + dk2
    else:
        # Column grads accumulate over every replica's rows — the transpose
        # of the forward all_gather (psum), then slice our block.
        dk1 = jax.lax.psum(dk1, axis_name)
        dk2 = jax.lax.psum(dk2, axis_name)
        dh1 = dq1 + jax.lax.dynamic_slice_in_dim(dk1, off, b_loc, 0)
        dh2 = dq2 + jax.lax.dynamic_slice_in_dim(dk2, off, b_loc, 0)
    # positive-pair identity terms: d/dq1 of -(q1 . k2_pos)/T twice (rows of
    # both directions) = -2 k2_pos / T, and symmetrically for q2.
    pos2 = jax.lax.dynamic_slice_in_dim(k2, off, b_loc, 0)
    pos1 = jax.lax.dynamic_slice_in_dim(k1, off, b_loc, 0)
    dh1 = (dh1 - 2.0 * pos2) / temperature
    dh2 = (dh2 - 2.0 * pos1) / temperature
    dhn = jnp.concatenate([dh1, dh2], axis=0) * (g_loss / b_loc)
    if hidden_norm:
        # h = x / ||x||  =>  dx = (dh - h * <h, dh>) / ||x||
        dhidden = (dhn - hn * jnp.sum(hn * dhn, axis=-1, keepdims=True)) / norm
    else:
        dhidden = dhn
    return (dhidden,)


ntxent_fused_metrics.defvjp(_fused_metrics_fwd, _fused_metrics_bwd)


def ntxent_fused_metrics_gspmd(hidden, hidden_norm: bool = True,
                               temperature: float = 1.0, mesh=None):
    """Fused NT-Xent under the GSPMD (jit + NamedSharding) training path.

    The Pallas kernel cannot be sharded by the XLA partitioner, so inside
    the GSPMD step we drop into an explicit ``shard_map`` island over the
    mesh's batch axes: split the global (2N, D) embeddings into the two
    view halves, hand each device its aligned (local-a, local-b) block,
    and run the rectangular kernel per device with its all_gather forward
    / column-grad psum backward — the same collective pattern GSPMD's own
    partitioning of the dense loss would insert (reference flagship scale:
    global batch 4096 on >=32 cores, README.md:109; tile structure
    objective.py:75-80).

    ``mesh=None`` or a 1-device batch extent falls through to the direct
    single-shard call.  Returns (loss, contrast_acc, contrast_entropy) as
    replicated global means; gradients flow through the shard_map island
    (pmean-of-local-means transpose delivers the 1/R cotangent each
    replica's custom VJP expects)."""
    if mesh is None:
        return ntxent_fused_metrics(hidden, hidden_norm, temperature, None)
    from jax.sharding import PartitionSpec as P

    from simclr_tpu.parallel import mesh as mesh_lib

    axes = mesh_lib.batch_axes(mesh)
    axes_t = axes if isinstance(axes, tuple) else (axes,)
    n = 1
    for a in axes_t:
        n *= mesh.shape[a]
    if n == 1:
        return ntxent_fused_metrics(hidden, hidden_norm, temperature, None)
    axis_name = axes_t if len(axes_t) > 1 else axes_t[0]
    b = hidden.shape[0] // 2
    if b % n:
        # Ragged per-device batch: the rectangular tile math assumes equal
        # row blocks.  Dense GSPMD handles any divisibility — use it.
        return _dense_loss_metrics(hidden, hidden_norm, temperature, None)

    def body(h1_local, h2_local):
        h = jnp.concatenate([h1_local, h2_local], axis=0)
        loss, acc, ent = ntxent_fused_metrics(h, hidden_norm, temperature,
                                              axis_name)
        # Local row-means -> replicated global means (equal shard sizes).
        return jax.lax.pmean(jnp.stack([loss, acc, ent]), axis_name)

    h1, h2 = jnp.split(hidden, 2, axis=0)
    out = jax.shard_map(body, mesh=mesh, in_specs=(P(axes), P(axes)),
                        out_specs=P(), check_vma=False)(h1, h2)
    return out[0], out[1], out[2]


def ntxent_loss_fused(hidden, hidden_norm: bool = True, temperature: float = 1.0):
    """Loss-only fused NT-Xent (compatibility wrapper)."""
    loss, _, _ = ntxent_fused_metrics(hidden, hidden_norm, temperature, None)
    return loss


def add_contrastive_loss_pallas(hidden, hidden_norm=True, temperature=1.0):
    """Drop-in for ntxent.add_contrastive_loss returning only the loss, with
    the Pallas forward on TPU and the dense reference elsewhere."""
    hidden = hidden.astype(jnp.float32)
    if hidden_norm:
        hidden = hidden / jnp.linalg.norm(hidden, axis=-1, keepdims=True).clip(1e-12)
    if _use_pallas():
        try:
            h1, h2 = jnp.split(hidden, 2, axis=0)
            loss_vec = _ntxent_pallas_fwd(h1, h2, h1, h2, 0, temperature,
                                          interpret=_FORCE_INTERPRET)[0]
            return jnp.mean(loss_vec)
        except Exception:  # pragma: no cover - fall back if Mosaic rejects
            pass
    loss, _, _ = ntxent_ref.add_contrastive_loss(
        hidden, hidden_norm=False, temperature=temperature
    )
    return loss
