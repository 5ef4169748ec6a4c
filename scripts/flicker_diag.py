"""Which contact rows FLICKER at the settled mixed state?  Settle the
pile, then step with collect_contacts and diff consecutive frames'
contact KEY SETS per class (ss/sc/cc slot0/cc slot1/s-terr/c-terr):
a row that disappears and reappears re-seats its warm accumulator and
re-seeds solver transients — the measured mixed agitation floor
(mean |v| ~1.4 rebuilt from frozen rest; spheres hold 0.19).

Usage: python scripts/flicker_diag.py [--bodies 10000] [--steps 600]
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
from mgf_tpu.world import step


def keysets(m, stype):
    """Valid contact keys split by class."""
    out = {}
    pc = m["pair_contacts"]
    i, j = np.asarray(pc["i"]), np.asarray(pc["j"])
    val = np.asarray(pc["contact"].valid)          # (S, P)
    S = val.shape[0]
    ti, tj = stype[i], stype[j]
    for s in range(S):
        v = val[s]
        for cls, msk in (("ss", (ti == 0) & (tj == 0)),
                         ("sc", (ti == 0) & (tj == 1)),
                         ("cs", (ti == 1) & (tj == 0)),
                         ("cc", (ti == 1) & (tj == 1))):
            sel = v & msk
            out[f"{cls}{s}"] = set(
                zip(i[sel].tolist(), j[sel].tolist(), [s] * int(sel.sum())))
    tc = m["terrain_contacts"]
    it = np.asarray(tc["i"])
    tri = np.asarray(tc["tri"])
    val = np.asarray(tc["contact"].valid)
    for s in range(val.shape[0]):
        v = val[s]
        for cls, msk in (("st", stype[it] == 0), ("ct", stype[it] == 1)):
            sel = v & msk
            out[f"{cls}{s}"] = set(
                zip(it[sel].tolist(), tri[sel].tolist(),
                    [s] * int(sel.sum())))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=10_000)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--freeze", action="store_true",
                    help="zero velocities before the diff window")
    args = ap.parse_args()

    world, cfg = stress_scene(args.bodies, mixed=True)
    f = jax.jit(functools.partial(step, cfg=cfg))
    w = world
    for s in range(args.steps):
        w, m = f(w)
    if args.freeze:
        import jax.numpy as jnp
        b = w.bodies
        z = jax.tree_util.tree_map(jnp.zeros_like, b.v)
        w = w._replace(bodies=b._replace(v=z, omega=z, delta=z))
        for s in range(20):
            w, m = f(w)

    fc = jax.jit(functools.partial(step, cfg=cfg, collect_contacts=True))
    stype = np.asarray(w.bodies.shape_type)
    prev = None
    agg = {}
    for s in range(args.frames):
        w, m = fc(w)
        ks = keysets(m, stype)
        if prev is not None:
            for cls in ks:
                lost = len(prev[cls] - ks[cls])
                gained = len(ks[cls] - prev[cls])
                n0 = max(len(prev[cls]), 1)
                a = agg.setdefault(cls, [0, 0, 0])
                a[0] += lost
                a[1] += gained
                a[2] += n0
        prev = ks
    print(f"{'class':6s} {'rows':>8s} {'lost/frame':>11s} "
          f"{'gained/frame':>13s} {'churn %':>8s}")
    for cls, (lost, gained, n) in sorted(agg.items()):
        fr = args.frames - 1
        print(f"{cls:6s} {n // fr:8d} {lost / fr:11.1f} "
              f"{gained / fr:13.1f} {100.0 * lost / n:8.2f}")


if __name__ == "__main__":
    main()
