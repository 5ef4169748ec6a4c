"""Track the worst capsule-terrain offender across steps: is the deep
contact FLICKERING (narrowphase/candidate churn), mis-aimed (normal or
point geometry), or steadily resisted-but-losing (solver equilibrium
under pile pressure)?

Usage: python scripts/mixed_worst_track.py [--bodies 10000] [--steps 600]
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from mgf_tpu.scenes import stress_scene
from mgf_tpu.world import step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=10_000)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--track", type=int, default=60)
    args = ap.parse_args()

    world, cfg = stress_scene(args.bodies, mixed=True)
    f = jax.jit(functools.partial(step, cfg=cfg))
    w = world
    for s in range(args.steps):
        w, m = f(w)

    fc = jax.jit(functools.partial(step, cfg=cfg, collect_contacts=True))
    # find the worst c-terr body at the settled state
    w2, m = fc(w)
    m0 = jax.tree_util.tree_map(np.asarray, m)
    stype = np.asarray(w.bodies.shape_type)
    tc = m0["terrain_contacts"]
    ct = tc["contact"]
    i_t = tc["i"]
    pent = -((ct.b.x - ct.a.x) * ct.n.x + (ct.b.y - ct.a.y) * ct.n.y
             + (ct.b.z - ct.a.z) * ct.n.z)
    pent = np.where(ct.valid & (stype[i_t][None] == 1),
                    np.maximum(pent, 0.0), 0.0)
    k = np.unravel_index(np.argmax(pent), pent.shape)
    bid = int(i_t[k[1]])
    print(f"tracking body {bid}, settled pen={pent.max():.3f}")

    for s in range(args.track):
        w, m = fc(w)
        mm = jax.tree_util.tree_map(np.asarray, m)
        tc = mm["terrain_contacts"]
        ct, i_t, tri = tc["contact"], tc["i"], tc["tri"]
        mine = i_t == bid
        pen_all = -((ct.b.x - ct.a.x) * ct.n.x
                    + (ct.b.y - ct.a.y) * ct.n.y
                    + (ct.b.z - ct.a.z) * ct.n.z)
        v = ct.valid[:, mine]
        p = np.where(v, np.maximum(pen_all[:, mine], 0.0), 0.0)
        faces = tri[mine]
        x = (float(np.asarray(w.bodies.x.x)[bid]),
             float(np.asarray(w.bodies.x.y)[bid]),
             float(np.asarray(w.bodies.x.z)[bid]))
        vel = (float(np.asarray(w.bodies.v.x)[bid]),
               float(np.asarray(w.bodies.v.y)[bid]),
               float(np.asarray(w.bodies.v.z)[bid]))
        om = (float(np.asarray(w.bodies.omega.x)[bid]),
              float(np.asarray(w.bodies.omega.y)[bid]),
              float(np.asarray(w.bodies.omega.z)[bid]))
        rows = []
        for c in range(p.shape[1]):
            for sl in range(p.shape[0]):
                if v[sl, c]:
                    nx = float(ct.n.x[:, mine][sl, c])
                    ny = float(ct.n.y[:, mine][sl, c])
                    nz = float(ct.n.z[:, mine][sl, c])
                    rows.append(f"f{int(faces[c])}/s{sl}"
                                f" p={p[sl, c]:.3f}"
                                f" n=({nx:.2f},{ny:.2f},{nz:.2f})")
        if s % 4 == 0:
            print(f"s{s:3d} pos=({x[0]:.3f},{x[1]:.3f},{x[2]:.3f}) "
                  f"v=({vel[0]:.2f},{vel[1]:.2f},{vel[2]:.2f}) "
                  f"|om|={np.hypot(np.hypot(om[0], om[1]), om[2]):.2f} "
                  f"| {' | '.join(rows)}", flush=True)


if __name__ == "__main__":
    main()
