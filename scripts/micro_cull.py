"""Microbench fat-grid cull/selection variants at 100k.

Variants:
  current   — 448 python-slice cull + jnp.stack + top_k (baseline)
  vec8      — vectorized (N, W, 8) math + top_k
  vecT      — component-blocked rows (N, 8, cap) per offset + top_k
  argmaxK   — vec8 cull + K-pass iterative argmax instead of top_k
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mgf_tpu import broadphase
from mgf_tpu.world import _body_bounds, shape_view, step
from mgf_tpu.physics import complete_motion, integrate
from mgf_tpu.scenes import stress_scene


def timed(name, f, args, iters=10):
    t0 = time.perf_counter()
    outs = f(*args[0])
    jax.block_until_ready(outs)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        outs = f(*args[i % len(args)])
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:22s} {dt:8.2f} ms   (compile {comp:.0f}s)", flush=True)


def offsets_sel8(centers, cfg):
    cx, cy, cz = broadphase._cell_coords(centers, cfg)
    half = lambda p, c: jnp.where(
        p - c.astype(p.dtype) * cfg.cell_size > 0.5 * cfg.cell_size,
        jnp.int32(1), jnp.int32(-1))
    sx_o, sy_o, sz_o = half(centers.x, cx), half(centers.y, cy), \
        half(centers.z, cz)
    hs = []
    for o in [(ax, ay, az) for ax in (0, 1) for ay in (0, 1)
              for az in (0, 1)]:
        hs.append(broadphase._bucket_index(
            cx + sx_o * o[0], cy + sy_o * o[1], cz + sz_o * o[2], cfg))
    return hs


def vec8_pairs(b, table, cfg, K):
    n = b.c.x.shape[0]
    cap = cfg.bucket_cap
    hs = offsets_sel8(b.c, cfg)
    rows = [table[h] for h in hs]                    # 8 x (N, cap*8)
    buck = jnp.concatenate(rows, axis=1).reshape(n, 8 * cap, 8)
    sx = b.c.x[:, None]
    sy = b.c.y[:, None]
    sz = b.c.z[:, None]
    sr = jnp.maximum(b.r.x, jnp.maximum(b.r.y, b.r.z))[:, None]
    self_rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    idx = buck[..., 4].astype(jnp.int32)
    ddx = buck[..., 0] - sx
    ddy = buck[..., 1] - sy
    ddz = buck[..., 2] - sz
    rr = buck[..., 3] + sr
    ok = ((buck[..., 4] >= 0.0) & (jnp.abs(ddx) <= rr)
          & (jnp.abs(ddy) <= rr) & (jnp.abs(ddz) <= rr)
          & (idx != self_rows))
    d2 = ddx * ddx + ddy * ddy + ddz * ddz
    score = jnp.where(ok, -d2, -jnp.inf)
    top, pick = jax.lax.top_k(score, K)
    partner = jnp.take_along_axis(jnp.where(ok, idx, -1), pick, axis=1)
    return jnp.where(jnp.isfinite(top), partner, -1)


def vecT_pairs(bT, tableT, cfg, K, self_xyzr):
    """tableT rows component-blocked: [x*cap y*cap z*cap r*cap idx*cap ...]"""
    n = self_xyzr[0].shape[0]
    cap = cfg.bucket_cap
    hs = offsets_sel8(broadphase.Vec3(self_xyzr[0], self_xyzr[1],
                                      self_xyzr[2]) if False else bT, cfg)
    raise SystemExit("unused")


def argmaxK_pairs(b, table, cfg, K):
    n = b.c.x.shape[0]
    cap = cfg.bucket_cap
    hs = offsets_sel8(b.c, cfg)
    rows = [table[h] for h in hs]
    buck = jnp.concatenate(rows, axis=1).reshape(n, 8 * cap, 8)
    sx = b.c.x[:, None]
    sy = b.c.y[:, None]
    sz = b.c.z[:, None]
    sr = jnp.maximum(b.r.x, jnp.maximum(b.r.y, b.r.z))[:, None]
    self_rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    idx = buck[..., 4].astype(jnp.int32)
    ddx = buck[..., 0] - sx
    ddy = buck[..., 1] - sy
    ddz = buck[..., 2] - sz
    rr = buck[..., 3] + sr
    ok = ((buck[..., 4] >= 0.0) & (jnp.abs(ddx) <= rr)
          & (jnp.abs(ddy) <= rr) & (jnp.abs(ddz) <= rr)
          & (idx != self_rows))
    d2 = ddx * ddx + ddy * ddy + ddz * ddz
    score = jnp.where(ok, -d2, -jnp.inf)
    parts = []
    for k in range(K):
        j = jnp.argmax(score, axis=1)
        good = jnp.take_along_axis(score, j[:, None], 1)[:, 0] > -jnp.inf
        parts.append(jnp.where(
            good, jnp.take_along_axis(idx, j[:, None], 1)[:, 0], -1))
        score = score.at[jnp.arange(n), j].set(-jnp.inf)
    return jnp.stack(parts, axis=1)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    world, cfg = stress_scene(n)
    f = jax.jit(functools.partial(step, cfg=cfg))
    w = world
    for i in range(120):
        w, m = f(w)
    jax.block_until_ready(w)
    print(f"state: contacts={int(m['num_contacts'])} "
          f"overflow={int(m['broadphase_overflow'])}", flush=True)

    state = integrate(complete_motion(w.bodies), cfg.dt)
    sv = shape_view(state)
    bounds = broadphase.swept_fat_bounds(_body_bounds(cfg, sv), state.delta,
                                         cfg.fatten)
    gcfg = cfg.grid
    K = cfg.max_pairs
    grid = broadphase.build_fat_grid(bounds, gcfg)
    gt = jax.device_put(grid.table)

    def noncify(i):
        eps = np.float32(1e-6 * (i + 1))
        return jax.tree_util.tree_map(lambda x: x + eps, bounds)

    bvars = [jax.device_put(noncify(i)) for i in range(10)]

    timed("current fat_grid_pairs", jax.jit(
        lambda b, t: broadphase.fat_grid_pairs(
            b, broadphase.FatGrid(t, jnp.int32(0)), gcfg, K,
            ordered=False, window="sel8")[0].sum()),
        [(b, gt) for b in bvars])

    timed("vec8 + top_k", jax.jit(
        lambda b, t: vec8_pairs(b, t, gcfg, K).sum()),
        [(b, gt) for b in bvars])

    timed("vec8 + argmaxK", jax.jit(
        lambda b, t: argmaxK_pairs(b, t, gcfg, K).sum()),
        [(b, gt) for b in bvars])


if __name__ == "__main__":
    main()
