"""Gated perf experiment: can Pallas beat XLA's bare 1x1 matmul?

Round-2 negative result (CLAUDE.md): a Pallas 1x1-conv+BN-stat epilogue lost
to XLA at every R50 shape (3.48 vs 2.10 ms at 802816x64->256 *including*
stats) and was removed.  The round-3 gate (VERDICT r2 item #9): beat XLA's
BARE matmul at that shape first; only then re-attach the BN epilogue.

Shape under test: the R50 g1 projection, two views of batch 128 at 56x56:
M = 2*128*56*56 = 802816, K = 64, N = 256, bf16 in / bf16 out.
Traffic floor = M*K*2 + K*N*2 + M*N*2 bytes ~ 514 MB; this op is
HBM-bandwidth-bound, so the only lever is scheduling/tiling quality.

Methodology (CLAUDE.md discipline): same-day A/B, lax.scan device loop with a
data dependency between iterations so nothing hoists, one host fetch per
timing, min-of-3.

Usage: python tools/exp_pallas_matmul.py [--steps 20] [--m 802816]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    float(jnp.sum(x.ravel()[:1]))


def timed(step_fn, a, w, inner_steps, label, flops, bytes_moved):
    """step_fn: (a, w) -> a (same shape/dtype, iteration-dependent)."""

    @jax.jit
    def run(a, w):
        def loop(carry, _):
            return step_fn(carry, w), ()

        a, _ = jax.lax.scan(loop, a, None, length=inner_steps)
        return a

    a = run(a, w)  # compile + warmup
    _fetch(a)
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        a = run(a, w)
        _fetch(a)
        trials.append(time.perf_counter() - t0)
    dt = min(trials) / inner_steps
    print(
        f"{label:>24}: {dt * 1e3:7.3f} ms   "
        f"{flops / dt / 1e12:6.2f} TFLOP/s   {bytes_moved / dt / 1e9:6.1f} GB/s"
    )
    return dt


def make_pallas_mm(bm, dimension_semantics="arbitrary"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, w_ref, o_ref):
        o_ref[...] = jnp.dot(
            a_ref[...], w_ref[...], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)

    def mm(a, w):
        m, k = a.shape
        n = w.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i: (i, 0)),
                pl.BlockSpec((k, n), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(dimension_semantics,)
            ),
        )(a, w)

    return mm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--m", type=int, default=802816)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--n", type=int, default=256)
    args = ap.parse_args()

    m, k, n = args.m, args.k, args.n
    rng = np.random.default_rng(0)
    a0 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.1, jnp.bfloat16)

    flops = 2 * m * k * n
    bytes_moved = 2 * (m * k + k * n + m * n)
    print(
        f"shape {m}x{k} @ {k}x{n} bf16: {flops / 1e9:.1f} GFLOP, "
        f"{bytes_moved / 1e6:.0f} MB minimum traffic "
        f"(device {jax.devices()[0].device_kind})"
    )

    def chain(mm_fn):
        # Feed a sliver of the output back into the input so the scan
        # cannot hoist or CSE the matmul across iterations; the extra work
        # (one 1xK row update) is noise.
        def step(a, w):
            out = mm_fn(a, w)
            bump = (out[:1, :k] * jnp.bfloat16(1e-8)).astype(a.dtype)
            return a.at[:1].add(bump)

        return step

    xla_mm = lambda a, w: jnp.dot(a, w)
    t_xla = timed(chain(xla_mm), a0, w, args.steps, "XLA dot", flops,
                  bytes_moved)

    # Numerics check once (bf16 dot, both paths accumulate f32 on MXU).
    ref = np.asarray(jnp.dot(a0, w), np.float32)

    best = None
    for bm in (512, 1024, 2048, 4096, 8192):
        if m % bm:
            continue
        mm = make_pallas_mm(bm)
        got = np.asarray(make_pallas_mm(bm)(a0, w), np.float32)
        err = np.abs(got - ref).max()
        t = timed(
            chain(mm), a0, w, args.steps, f"pallas bm={bm}", flops,
            bytes_moved,
        )
        print(f"{'':>24}  max |diff| vs XLA: {err:.3e}")
        if best is None or t < best[1]:
            best = (bm, t)

    bm, t_pl = best
    verdict = "WIN" if t_pl < t_xla else "LOSS"
    print(
        f"\nGATE: Pallas best (bm={bm}) {t_pl * 1e3:.3f} ms vs XLA "
        f"{t_xla * 1e3:.3f} ms -> {verdict}"
        + ("" if t_pl < t_xla else " (do NOT re-attach the BN epilogue)")
    )


if __name__ == "__main__":
    main()
