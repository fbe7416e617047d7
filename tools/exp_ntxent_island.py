"""Fused-NT-Xent gate calibration at SHARDED island shapes (VERDICT r4 #6).

The r2 measurement that set the 'auto' gate (fused 1.59x at 2N=8192) was
single-chip: the kernel saw the full square (8192, 8192) logits tile.  At
the reference's flagship scale (global 4096 over 32 chips, README.md:109)
each shard's island computes a RECTANGULAR (2*B_local, 2N_global) tile —
e.g. (256, 8192) — a regime the square-tile ladder never measured.

This tool times fwd+bwd of the streaming Pallas kernel against the dense
row-block math a GSPMD partitioning of the reference loss would run on one
shard, across local-rows x global-cols grids.  One real chip stands in for
one shard: collectives are excluded on BOTH sides (identical all-gather /
psum pattern, ops/ntxent_pallas.py::_gather_keys), so the comparison is
exactly the part the gate chooses between.

Usage: python tools/exp_ntxent_island.py [--iters 50] [--dim 128]
Prints one JSON line per (rows, cols) cell: dense ms, fused ms, ratio.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def dense_shard_loss(q1, q2, k1, k2, off, temperature):
    """The dense per-shard row-block math (reference objective.py:75-124
    partitioned over rows): full (2n_loc, 2N_glob) logits in HBM, self
    column masked, softmax cross-entropy toward the positive column."""
    n_loc = q1.shape[0]
    n_glob = k1.shape[0]
    rows = jnp.concatenate([q1, q2], 0)                  # (2n, D)
    keys = jnp.concatenate([k1, k2], 0)                  # (2N, D)
    logits = jnp.dot(rows, keys.T) / temperature         # (2n, 2N)
    idx = off + jnp.arange(n_loc)
    # self columns: view-a row i <-> key i; view-b row i <-> key N+i
    self_cols = jnp.concatenate([idx, n_glob + idx])
    logits = logits - 1e9 * jax.nn.one_hot(self_cols, 2 * n_glob,
                                           dtype=logits.dtype)
    # positive columns: the other view of the same image
    pos_cols = jnp.concatenate([n_glob + idx, idx])
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, pos_cols[:, None], axis=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from simclr_tpu.ops import ntxent_pallas

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}", flush=True)

    def time_fn(f, *xs):
        """lax.scan the grad step `iters` times, one host fetch (the ~30 ms
        tunnel fetch floor amortizes; CLAUDE.md timing rules)."""
        def body(c, _):
            outs = f(*[x + c for x in xs])
            s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(outs))
            return c + 0.0 * s.astype(jnp.float32), None

        loop = jax.jit(lambda: jax.lax.scan(
            body, jnp.float32(0), None, length=args.iters)[0])
        float(loop())  # compile + warmup
        best = np.inf
        for _ in range(args.trials):
            t0 = time.perf_counter()
            float(loop())
            best = min(best, time.perf_counter() - t0)
        return best / args.iters * 1e3  # ms/iter

    rng = np.random.RandomState(0)
    results = []
    for cols in (4096, 8192, 16384):
        for rows in (128, 256, 512, 1024, 2048, 4096):
            if rows > cols:
                continue
            n_loc, n_glob = rows // 2, cols // 2
            q1 = jnp.asarray(rng.randn(n_loc, args.dim), jnp.float32)
            q2 = jnp.asarray(rng.randn(n_loc, args.dim), jnp.float32)
            k1 = jnp.asarray(rng.randn(n_glob, args.dim), jnp.float32)
            k2 = jnp.asarray(rng.randn(n_glob, args.dim), jnp.float32)
            off = jnp.int32(0)

            def fused(a, b, c, d_):
                # the kernel pair the custom VJP runs: streaming fwd stats
                # + streaming bwd (dq and dk blocks)
                lv, m_a, l_a, m_b, l_b, *_ = ntxent_pallas._ntxent_pallas_fwd(
                    a, b, c, d_, off, 0.1)
                grads = ntxent_pallas._ntxent_pallas_bwd(
                    a, b, c, d_, off, m_a, l_a, m_b, l_b, 0.1)
                return (jnp.mean(lv),) + tuple(grads)

            def dense(a, b, c, d_):
                l, grads = jax.value_and_grad(
                    dense_shard_loss, argnums=(0, 1, 2, 3))(a, b, c, d_, 0, 0.1)
                return (l,) + tuple(grads)

            t_dense = time_fn(dense, q1, q2, k1, k2)
            t_fused = time_fn(fused, q1, q2, k1, k2)
            row = {"rows": rows, "cols": cols,
                   "dense_ms": round(t_dense, 3),
                   "fused_ms": round(t_fused, 3),
                   "fused_speedup": round(t_dense / t_fused, 3)}
            results.append(row)
            print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    main()
