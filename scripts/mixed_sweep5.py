"""r5 mixed-quality sweep: settle the 10k mixed pile under config
variants and report agitation + containment + penetration statistics —
the instruments the r4 sweeps lacked (max-pen alone cannot distinguish
witness artifacts, convergence deficit, and energy injection).

Per config: settled metric max_pen, mean/p99 |v|, bodies escaped
(below floor / beyond walls), contacts, warm-hit fraction.

Usage: python scripts/mixed_sweep5.py [--bodies 10000] [--steps 600]
       [--configs base,noadapt,heavy,mid,k12,cand5]
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: F401
import jax
import numpy as np

from mgf_tpu.scenes import stress_scene
from mgf_tpu.world import init_bp_cache, init_warm, step


def variant(name, cfg):
    if name == "base":
        return cfg
    if name == "noadapt":
        return cfg._replace(adapt_schedule=None)
    if name == "heavy":
        return cfg._replace(adapt_schedule=None, solver_iters=6,
                            solver_inner=6)
    if name == "mid":
        return cfg._replace(cap_manifold="mid")
    if name == "k12":
        return cfg._replace(max_pairs=12)
    if name == "cand5":
        return cfg._replace(terrain_cand=5)
    if name == "slop0":
        return cfg._replace()
    raise ValueError(name)


def run(name, bodies, steps):
    from mgf_tpu import solver
    frac = 0.25
    vname = name
    if name.startswith("allcap"):
        frac = 1.0
        vname = name[len("allcap"):].lstrip("_") or "base"
    w, cfg = stress_scene(bodies, mixed=True, cap_frac=frac)
    solver.BAUMGARTE = 0.0 if vname.startswith("nobias") else 0.2
    if vname.startswith(("nobias", "norest", "nofric")):
        b = w.bodies
        if vname.startswith("norest"):
            b = b._replace(restitution=b.restitution * 0.0)
        if vname.startswith("nofric"):
            b = b._replace(friction=b.friction * 0.0)
        w = w._replace(bodies=b)
        vname = "base"
    cfg = variant(vname, cfg)
    w = w._replace(warm=None, bp=None)
    w = init_warm(w, cfg)
    if cfg.bp_every > 1:
        w = init_bp_cache(w, cfg)
    f = jax.jit(functools.partial(step, cfg=cfg))
    for s in range(steps):
        w, m = f(w)
    x = np.stack([np.asarray(w.bodies.x.x), np.asarray(w.bodies.x.y),
                  np.asarray(w.bodies.x.z)], -1)
    v = np.linalg.norm(np.stack(
        [np.asarray(w.bodies.v.x), np.asarray(w.bodies.v.y),
         np.asarray(w.bodies.v.z)], -1), axis=-1)
    wall = float(np.asarray(w.terrain.a.x).max())
    esc = int(np.sum((x[:, 1] < -2.0) | (np.abs(x[:, 0]) > wall + 1)
                     | (np.abs(x[:, 2]) > wall + 1)))
    print(f"{name:8s} pen={float(np.asarray(m['max_penetration'])):.3f} "
          f"contacts={int(np.asarray(m['num_contacts']))} "
          f"mean|v|={v.mean():.3f} p99|v|={np.percentile(v, 99):.2f} "
          f"max|v|={v.max():.1f} escaped={esc} "
          f"warm_hit={float(np.asarray(m['warm_hit_frac'])):.3f}",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=10_000)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--configs", type=str,
                    default="base,noadapt,heavy,mid,k12,cand5")
    args = ap.parse_args()
    for name in args.configs.split(","):
        run(name, args.bodies, args.steps)


if __name__ == "__main__":
    main()
