"""Whole post-crop augmentation chain as ONE Pallas TPU kernel (SURVEY N8/N9).

The reference applies random-order color jitter, random grayscale and random
blur per image on the host (data_util.py:120-181, 387-394, 417-444).  The
XLA device port computes, per permutation slot, ALL candidate ops for every
image and selects (SPMD over the batch), and round-trips the batch through
HBM once per stage.  This kernel processes one image per grid program
entirely in VMEM, planar layout (C, H, W):

  * 4 jitter slots — `lax.switch` on the slot's op, so each image computes
    ONLY its drawn op (brightness / contrast / saturation / hue), not all
    three variants; gated per image at p=0.8;
  * grayscale (p=0.2 gate);
  * separable gaussian blur — vertical taps as sublane shifts per plane,
    horizontal taps across an in-VMEM transpose, selector-gated (p=0.5);
  * clips placed exactly where the XLA ops it replaces clip.

All tensor values inside the kernel are strictly 2D (H, W) planes — Mosaic's
layout inference aborts on 3D intermediates — and flow through the kernel as
a (r, g, b) tuple.

All randomness is drawn OUTSIDE with byte-identical key splits to the XLA
path (ops/augment.py::_jitter_draws) and enters as small SMEM tables, so
gating decisions match the non-Pallas path bit-for-bit; arithmetic runs in
f32 (the reference computes f32 on host CPU), where the XLA path computes in
the image dtype.  Equivalence: interpreter-mode test in
tests/test_fused_kernels.py (max |diff| ~2e-6 vs the XLA path at f32).

Forward-only: augmentation sits outside the loss closure (no gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hsv_split(r, g, b):
    """rgb -> (h6 in [0,6), s, v) — branch-free, matches augment.rgb_to_hsv
    up to the h*6 scaling (kept unscaled to save ops in chan())."""
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    inv_delta = 1.0 / jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) * inv_delta
    gc = (maxc - g) * inv_delta
    bc = (maxc - b) * inv_delta
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h6 = jnp.where(delta > 0, h % 6.0, 0.0)
    s = jnp.where(maxc > 0, delta / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    return h6, s, maxc


def _hsv_merge(h6, s, v):
    """(h6, s, v) -> (r, g, b), branch-free sextant (augment.hsv_to_rgb)."""
    vs = v * s

    def chan(n):
        k = (n + h6) % 6.0
        return v - vs * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return chan(5.0), chan(3.0), chan(1.0)


def _weight_mat_t(m: int, n: int, scale, translation):
    """Transposed bicubic sampling matrix (n outputs x m inputs) — the exact
    math of jax.image's compute_weight_mat (Keys cubic a=-0.5, per-output
    normalization, out-of-range zeroing), evaluated on broadcasted iotas so
    it builds on the VPU from two scalars.  Negative ``scale`` mirrors the
    sampling (the folded horizontal flip)."""
    inv = 1.0 / scale
    o = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0).astype(jnp.float32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1).astype(jnp.float32)
    sample = (o + 0.5) * inv - translation * inv - 0.5
    xk = jnp.abs(sample - idx)
    wgt = ((1.5 * xk - 2.5) * xk) * xk + 1.0
    wgt = jnp.where(xk >= 1.0, ((-0.5 * xk + 2.5) * xk - 4.0) * xk + 2.0, wgt)
    wgt = jnp.where(xk >= 2.0, 0.0, wgt)
    tot = jnp.sum(wgt, axis=1, keepdims=True)
    wgt = jnp.where(jnp.abs(tot) > 1000.0 * 1.1920929e-07,
                    wgt / jnp.where(tot != 0.0, tot, 1.0), 0.0)
    valid = (sample >= -0.5) & (sample <= m - 0.5)
    return jnp.where(valid, wgt, 0.0)


# Per-view scalar-table layout (one packed f32 row per view, fetched into
# VMEM per program — whole-array SMEM tables cost ~128 B/scalar and blow the
# 1 MB SMEM budget beyond ~250 views).
_PERM0, _U0, _GATE0, _CROP0, _TAP0 = 0, 4, 8, 11, 15


def _color_kernel(tab_ref, x_ref, out_ref, *, radius: int, brightness: float,
                  contrast: float, saturation: float, hue: float,
                  v1_brightness: bool, do_crop: bool):
    tab = tab_ref[0]  # (1, T) f32 — this view's packed scalars
    h, w = out_ref.shape[2], out_ref.shape[3]
    # out_ref doubles as the working buffer between stages (writing to input
    # refs is not guaranteed to stick).
    if do_crop:
        # Distorted-bbox crop + bicubic resize as two MXU matmuls per plane,
        # with per-image sampling matrices built in-VMEM from the box
        # scale/translation scalars (flip pre-folded into sx/tx).
        hin, win = x_ref.shape[2], x_ref.shape[3]
        integer_in = jnp.issubdtype(x_ref.dtype, jnp.integer)
        # uint8 canvases convert to [0,1] float HERE, per plane in VMEM —
        # the float canvas never exists in HBM.
        cdt = out_ref.dtype if integer_in else x_ref.dtype
        wv = _weight_mat_t(hin, h, tab[0, _CROP0 + 0], tab[0, _CROP0 + 2]).astype(cdt)
        wh = _weight_mat_t(win, w, tab[0, _CROP0 + 1], tab[0, _CROP0 + 3]).astype(cdt)
        for p_ in range(3):
            plane = x_ref[0, p_]
            if integer_in:
                # Mosaic has no u8->f32 cast; hop through int32.
                plane = plane.astype(jnp.int32).astype(jnp.float32)
                plane = (plane / 255.0).astype(cdt)
            tmp = jax.lax.dot_general(
                wv, plane, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (h, win)
            res = jax.lax.dot_general(
                tmp.astype(cdt), wh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (h, w)
            out_ref[0, p_] = res.astype(out_ref.dtype)
    else:
        out_ref[0, 0] = x_ref[0, 0]
        out_ref[0, 1] = x_ref[0, 1]
        out_ref[0, 2] = x_ref[0, 2]

    def read():
        return (out_ref[0, 0].astype(jnp.float32),
                out_ref[0, 1].astype(jnp.float32),
                out_ref[0, 2].astype(jnp.float32))

    def write(r, g, b):
        out_ref[0, 0] = r.astype(out_ref.dtype)
        out_ref[0, 1] = g.astype(out_ref.dtype)
        out_ref[0, 2] = b.astype(out_ref.dtype)

    def slot(rgb, op, u):
        def each(f, rgb):
            return (f(rgb[0]), f(rgb[1]), f(rgb[2]))

        def do_brightness(rgb):
            if not brightness:
                return rgb
            if v1_brightness:
                d = u * (2.0 * brightness) - brightness
                return each(lambda x: x + d, rgb)
            lo = max(1.0 - brightness, 0.0)
            f = u * ((1.0 + brightness) - lo) + lo
            return each(lambda x: x * f, rgb)

        def do_contrast(rgb):
            if not contrast:
                return rgb
            f = u * (2.0 * contrast) + (1.0 - contrast)
            return each(lambda x: (x - jnp.mean(x)) * f + jnp.mean(x), rgb)

        def do_sat_or_hue(rgb, is_hue):
            if not (saturation or hue):
                return rgb
            r, g, b = each(lambda x: jnp.clip(x, 0.0, 1.0), rgb)
            h6, s, v = _hsv_split(r, g, b)
            if hue:
                dh6 = (u * (2.0 * hue) - hue) * 6.0
                h6 = jnp.where(is_hue, (h6 + dh6) % 6.0, h6)
            if saturation:
                fs = u * (2.0 * saturation) + (1.0 - saturation)
                s = jnp.where(is_hue, s, jnp.clip(s * fs, 0.0, 1.0))
            return _hsv_merge(h6, s, v)

        out = jax.lax.switch(op, [
            do_brightness,
            do_contrast,
            lambda rgb: do_sat_or_hue(rgb, False),
            lambda rgb: do_sat_or_hue(rgb, True),
        ], rgb)
        return each(lambda x: jnp.clip(x, 0.0, 1.0), out)

    @pl.when(tab[0, _GATE0] > 0)  # jitter applied (p=0.8)
    def _():
        rgb = read()
        for k in range(4):
            rgb = slot(rgb, tab[0, _PERM0 + k].astype(jnp.int32),
                       tab[0, _U0 + k])
        write(*rgb)

    @pl.when(tab[0, _GATE0 + 1] > 0)  # grayscale (p=0.2)
    def _():
        r, g, b = read()
        gray = 0.2989 * r + 0.587 * g + 0.114 * b
        write(gray, gray, gray)

    @pl.when(tab[0, _GATE0 + 2] > 0)  # blur selector (p=0.5)
    def _():
        ksize = 2 * radius + 1

        def blur_plane(plane):
            # preprocess_for_train ends with a clip BEFORE blur runs
            # (bicubic crops overshoot [0,1]) — match that ordering.
            plane = jnp.clip(plane, 0.0, 1.0)
            pad_v = jnp.pad(plane, ((radius, radius), (0, 0)))
            acc = jnp.zeros((h, w), jnp.float32)
            for k in range(ksize):
                acc = acc + tab[0, _TAP0 + k] * pad_v[k:k + h, :]
            acc_t = jnp.pad(acc.T, ((radius, radius), (0, 0)))
            acc2 = jnp.zeros((w, h), jnp.float32)
            for k in range(ksize):
                acc2 = acc2 + tab[0, _TAP0 + k] * acc_t[k:k + w, :]
            return acc2.T

        r, g, b = read()
        write(blur_plane(r), blur_plane(g), blur_plane(b))

    r, g, b = read()
    write(jnp.clip(r, 0.0, 1.0), jnp.clip(g, 0.0, 1.0), jnp.clip(b, 0.0, 1.0))


@functools.partial(jax.jit, static_argnames=(
    "brightness", "contrast", "saturation", "hue", "v1_brightness",
    "kernel_size", "interpret"))
def fused_color_pipeline(images, perm, u, gates, sigmas, *,
                         brightness: float, contrast: float,
                         saturation: float, hue: float,
                         v1_brightness: bool = False,
                         kernel_size: int = 0, interpret: bool = False):
    """Apply jitter+grayscale(+blur) to NHWC ``images`` with per-image draws.

    perm (B,4) int32 op order; u (B,4) f32 shared uniforms; gates (B,3)
    int32 [jitter, grayscale, blur]; sigmas (B,) f32 blur sigmas (ignored
    when kernel_size == 0, which also disables the blur stage).
    """
    b, h, w, c = images.shape
    assert c == 3, "fused color pipeline is RGB-only"
    radius = int(kernel_size) // 2
    if kernel_size:
        taps = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
        kern = jnp.exp(-(taps[None, :] ** 2) /
                       (2.0 * (sigmas.astype(jnp.float32)[:, None] ** 2)))
        kern = kern / jnp.sum(kern, axis=1, keepdims=True)
    else:
        gates = gates.at[:, 2].set(0)
        kern = jnp.zeros((b, 1), jnp.float32)

    planar = jnp.transpose(images, (0, 3, 1, 2))  # NHWC -> NCHW
    crop = jnp.zeros((b, 4), jnp.float32)
    out = _call_kernel(planar, crop, perm, u, gates, kern, (h, w), b,
                       radius=radius, brightness=brightness,
                       contrast=contrast, saturation=saturation, hue=hue,
                       v1_brightness=v1_brightness, do_crop=False,
                       interpret=interpret)
    return jnp.transpose(out, (0, 2, 3, 1))


def _call_kernel(planar, crop, perm, u, gates, kern, out_hw, n_views, *,
                 radius, brightness, contrast, saturation, hue,
                 v1_brightness, do_crop, interpret, out_dtype=None):
    b, c = planar.shape[0], planar.shape[1]
    h, w = out_hw
    hin, win = planar.shape[2], planar.shape[3]
    out_dtype = out_dtype or planar.dtype
    # Packed per-view scalar table: [perm(4) | u(4) | gates(3) | crop(4) |
    # taps(ksize)] as one f32 row per view, shaped (V, 1, T) so each program
    # fetches only its own row into VMEM.
    tab = jnp.concatenate([
        perm.astype(jnp.float32), u.astype(jnp.float32),
        gates.astype(jnp.float32), crop.astype(jnp.float32),
        kern.astype(jnp.float32),
    ], axis=1)[:, None, :]
    t = tab.shape[-1]
    return pl.pallas_call(
        functools.partial(
            _color_kernel, radius=radius, brightness=brightness,
            contrast=contrast, saturation=saturation, hue=hue,
            v1_brightness=v1_brightness, do_crop=do_crop),
        out_shape=jax.ShapeDtypeStruct((n_views, c, h, w), out_dtype),
        grid=(n_views,),
        in_specs=[
            pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, hin, win), lambda i: (i % b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tab, planar)


@functools.partial(jax.jit, static_argnames=(
    "out_hw", "brightness", "contrast", "saturation", "hue", "v1_brightness",
    "out_dtype", "kernel_size", "interpret", "mesh"))
def fused_crop_color_pipeline(canvas, crop_params, perm, u, gates, sigmas, *,
                              out_hw, brightness: float, contrast: float,
                              saturation: float, hue: float,
                              v1_brightness: bool = False, out_dtype=None,
                              kernel_size: int = 0, interpret: bool = False,
                              mesh=None):
    """The ENTIRE two-view augmentation after box/flip sampling: bicubic
    distorted crop (+folded flip) + jitter + grayscale + blur, one Pallas
    program per view.  ``canvas`` is the NHWC host canvas (B, Hin, Win, 3);
    each of the V = crop_params.shape[0] views reads canvas image
    ``view % B`` (views stacked a-then-b like two_view_pretrain_batch).

    crop_params (V, 4) f32 = [sy, sx, ty, tx] scale/translation per view
    (sx negative for folded flips); remaining tables as fused_color_pipeline.

    ``mesh``: when called inside a GSPMD (jit + NamedSharding) step on a
    multi-device mesh, the partitioner cannot shard a pallas_call — left
    alone it would all-gather the batch and re-augment the FULL global
    batch on every chip.  Passing the mesh drops the kernel into a
    shard_map island over the mesh's batch axes (the same pattern as
    ntxent_fused_metrics_gspmd): every per-view randomness table is drawn
    globally by the caller, so each shard augments exactly its rows and
    the result is bit-identical to the single-shard call.
    """
    if mesh is not None:
        out = _fused_crop_sharded(
            canvas, crop_params, perm, u, gates, sigmas, mesh=mesh,
            out_hw=out_hw, brightness=brightness, contrast=contrast,
            saturation=saturation, hue=hue, v1_brightness=v1_brightness,
            out_dtype=out_dtype, kernel_size=kernel_size, interpret=interpret)
        if out is not None:
            return out
    b, hin, win, c = canvas.shape
    assert c == 3, "fused color pipeline is RGB-only"
    h, w = out_hw
    v = crop_params.shape[0]
    radius = int(kernel_size) // 2
    if kernel_size:
        taps = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
        kern = jnp.exp(-(taps[None, :] ** 2) /
                       (2.0 * (sigmas.astype(jnp.float32)[:, None] ** 2)))
        kern = kern / jnp.sum(kern, axis=1, keepdims=True)
    else:
        gates = gates.at[:, 2].set(0)
        kern = jnp.zeros((v, 1), jnp.float32)
    planar = jnp.transpose(canvas, (0, 3, 1, 2))
    out = _call_kernel(planar, crop_params, perm, u, gates, kern, (h, w), v,
                       radius=radius, brightness=brightness,
                       contrast=contrast, saturation=saturation, hue=hue,
                       v1_brightness=v1_brightness, do_crop=True,
                       interpret=interpret, out_dtype=out_dtype)
    return jnp.transpose(out, (0, 2, 3, 1))


def _fused_crop_sharded(canvas, crop_params, perm, u, gates, sigmas, *,
                        mesh, **kw):
    """shard_map island running fused_crop_color_pipeline per batch shard.

    The canvas (B, Hin, Win, 3) is batch-sharded on dim 0; the V per-view
    tables are stacked in ``V // B`` view groups of B rows each (a-then-b
    for the two-view pretrain layout, a single group for the finetune crop
    and host-cropped layouts).  Each group is split out, sharded on its own
    dim 0 alongside the canvas, re-stacked locally (so the kernel's
    ``view % B_local`` indexing lines up), and the local outputs are
    reassembled group-major — the global a-then-b order.

    Returns None when the island does not apply (single shard, or shapes
    that do not divide) so the caller falls through to the direct call.
    """
    from jax.sharding import PartitionSpec as P

    from simclr_tpu.parallel import mesh as mesh_lib

    n = mesh_lib.num_batch_shards(mesh)
    b = canvas.shape[0]
    v = crop_params.shape[0]
    if n == 1 or b % n or v % b:
        return None
    nv = v // b
    axes = mesh_lib.batch_axes(mesh)

    tables = (crop_params, perm, u, gates, sigmas)
    groups = tuple(t[i * b:(i + 1) * b] for i in range(nv) for t in tables)

    def body(canvas_l, *groups_l):
        per_group = [groups_l[i * len(tables):(i + 1) * len(tables)]
                     for i in range(nv)]
        locals_ = [jnp.concatenate([g[j] for g in per_group], axis=0)
                   for j in range(len(tables))]
        out = fused_crop_color_pipeline(
            canvas_l, *locals_, mesh=None, **kw)
        bl = canvas_l.shape[0]
        return tuple(out[i * bl:(i + 1) * bl] for i in range(nv))

    in_specs = (P(axes),) + (P(axes),) * len(groups)
    out_specs = tuple(P(axes) for _ in range(nv))
    outs = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)(
        canvas, *groups)
    return jnp.concatenate(outs, axis=0) if nv > 1 else outs[0]
