"""Microbench the Pallas solver-sweep kernel: block size + sweep count
scaling at flagship shapes ((R=12, N=100k), 8 inner sweeps).

The s4 sweep showed in-kernel sweeps cost ~0.175 ms each (~10% VPU
efficiency at ~430 Kflop/block/sweep) — this isolates whether the cost is
the sweep VPU work (scales with inner_iters), the HBM stream (flat), or
the grid/block structure (block-size dependent).

Usage: python scripts/micro_sweep.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mgf_tpu.ops import solver_sweep as ss

R, N = 12, 100_352  # 512 | N


def run(block, inner, iters=30):
    old = ss._BLOCK
    ss._BLOCK = block
    try:
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 5)
        fields = jax.random.normal(ks[0], (ss._NCH, R, N), jnp.float32)
        fields = fields.at[17].set(1.0)   # valid
        fields = fields.at[14].set(0.1)   # normal mass
        fields = fields.at[15].set(0.1)
        fields = fields.at[16].set(0.1)
        term = jax.random.normal(ks[1], (3, R, N), jnp.float32) * 0.01
        self_p = jnp.abs(jax.random.normal(ks[2], (2, N), jnp.float32))
        S = jax.random.normal(ks[3], (8, N), jnp.float32) * 0.01
        acc = jnp.zeros((3, R, N), jnp.float32)

        f = jax.jit(lambda S, a, t: ss.inner_sweeps(
            S, fields, t, self_p, a, inner))
        S1, a1 = f(S, acc, term)
        jax.block_until_ready((S1, a1))
        t0 = time.perf_counter()
        s, a, t = S, acc, term
        for i in range(iters):
            # chain to prevent memoization; term varies per call
            s, a = f(s, a, t)
            t = t * np.float32(1.0 + 1e-6)
        jax.block_until_ready((s, a))
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"block {block:5d} inner {inner:2d}: {ms:7.3f} ms/call "
              f"({ms / max(inner, 1):.3f} ms/sweep)", flush=True)
        return ms
    finally:
        ss._BLOCK = old


def run_blockmajor(block, inner, iters=30):
    """Variant: all tensors pre-shuffled BLOCK-MAJOR ((nb, ..., block)) so
    every grid step's DMA is one contiguous run instead of 216 strided
    2 KB segments."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = N // block
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    fields = jax.random.normal(ks[0], (nb, ss._NCH, R, block), jnp.float32)
    fields = fields.at[:, 17].set(1.0)
    fields = fields.at[:, 14].set(0.1)
    fields = fields.at[:, 15].set(0.1)
    fields = fields.at[:, 16].set(0.1)
    term = jax.random.normal(ks[1], (nb, 3, R, block), jnp.float32) * 0.01
    self_p = jnp.abs(jax.random.normal(ks[2], (nb, 2, block), jnp.float32))
    S = jax.random.normal(ks[3], (nb, 8, block), jnp.float32) * 0.01
    acc = jnp.zeros((nb, 3, R, block), jnp.float32)

    def kern(f_ref, t_ref, sp_ref, s_ref, a_ref, so_ref, ao_ref):
        ss._kernel(f_ref[0], t_ref[0], sp_ref[0], s_ref[0], a_ref[0],
                   _Sub(so_ref), _Sub(ao_ref), inner_iters=inner)

    class _Sub:
        """Adapter: writes through the leading block axis."""
        def __init__(self, ref):
            self.ref = ref

        def __setitem__(self, idx, val):
            if isinstance(idx, slice) and idx == slice(None):
                self.ref[0] = val
            else:
                self.ref[0, idx] = val

    bs4 = lambda c: pl.BlockSpec((1, c, R, block), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    bs3 = lambda c: pl.BlockSpec((1, c, block), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    f = jax.jit(lambda S, a, t: pl.pallas_call(
        kern, grid=(nb,),
        in_specs=[bs4(ss._NCH), bs4(3), bs3(2), bs3(8), bs4(3)],
        out_specs=[bs3(8), bs4(3)],
        out_shape=[jax.ShapeDtypeStruct((nb, 8, block), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 3, R, block), jnp.float32)],
    )(fields, t, self_p, S, a))
    S1, a1 = f(S, acc, term)
    jax.block_until_ready((S1, a1))
    t0 = time.perf_counter()
    s, a, t = S, acc, term
    for i in range(iters):
        s, a = f(s, a, t)
        t = t * np.float32(1.0 + 1e-6)
    jax.block_until_ready((s, a))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"BLKMAJ block {block:5d} inner {inner:2d}: {ms:7.3f} ms/call",
          flush=True)


if __name__ == "__main__":
    for block in (512, 1024, 2048):
        for inner in (1, 8):
            run(block, inner)
    for block in (512, 1024, 2048):
        for inner in (1, 8):
            run_blockmajor(block, inner)
