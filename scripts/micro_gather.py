"""Micro-benchmark: solver partner-state gather layouts on the real chip.

The row solver's per-outer-iteration gather is ``S[:, partner]`` with
S (8, M) and partner (R, N) — a minor-axis gather.  The narrowphase's
fast pattern is row-major: ``T[partner]`` with T (M, W) fetches one
contiguous W-wide row per index.  This measures both (plus the transpose
needed to produce T from S each iteration) at headline scale.

Usage: python scripts/micro_gather.py [--n 100000] [--r 9]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, args_list):
    out = f(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [f(*a) for a in args_list]
    for o in outs:
        np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / len(args_list) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--r", type=int, default=9)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    n, r = args.n, args.r
    rng = np.random.default_rng(0)

    S = jnp.asarray(rng.standard_normal((8, n + 1)), jnp.float32)
    T = S.T
    idx = jnp.asarray(rng.integers(0, n + 1, (r, n)), jnp.int32)

    def minor(S, idx):
        g = S[:, idx]                       # (8, R, N)
        return g[0] + g[3] * 2.0 + g[5]

    def rowm(T, idx):
        g = T[idx]                          # (R, N, 8)
        return g[..., 0] + g[..., 3] * 2.0 + g[..., 5]

    def rowm_t(S, idx):
        g = S.T[idx]                        # transpose included
        return g[..., 0] + g[..., 3] * 2.0 + g[..., 5]

    mk = lambda a: [(a, jnp.asarray(
        np.asarray(idx) * 0 + np.asarray(idx))) for _ in range(args.iters)]
    argsS = [(S * (1.0 + 1e-6 * i), idx) for i in range(args.iters)]
    argsT = [(T * (1.0 + 1e-6 * i), idx) for i in range(args.iters)]
    print(f"minor-axis S[:, idx] (8,{n}) x ({r},{n}): "
          f"{timeit(jax.jit(minor), argsS):.3f} ms", flush=True)
    print(f"row-major  T[idx]    ({n},8) x ({r},{n}): "
          f"{timeit(jax.jit(rowm), argsT):.3f} ms", flush=True)
    print(f"row-major + transpose S.T[idx]:           "
          f"{timeit(jax.jit(rowm_t), argsS):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
