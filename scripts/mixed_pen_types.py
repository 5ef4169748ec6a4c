"""Per-type penetration breakdown for the mixed stress scene.

Settles the pile, then runs one step with ``collect_contacts=True`` and
attributes the deepest penetrations to (type_a, type_b) contact classes
(ss / sc / cs / cc / s-terr / c-terr), plus candidate-slot saturation
(bodies whose K-th pair slot is live — a sign the top-k is DROPPING real
overlaps, which leaves their penetration unresisted).

Usage: python scripts/mixed_pen_types.py [--bodies 10000] [--steps 600]
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
    ap.add_argument("--K", type=int, default=0, help="override max_pairs")
    args = ap.parse_args()

    world, cfg = stress_scene(args.bodies, mixed=True)
    if args.K:
        cfg = cfg._replace(max_pairs=args.K)
    f = jax.jit(functools.partial(step, cfg=cfg))
    w = world
    for s in range(args.steps):
        w, m = f(w)
    fc = jax.jit(functools.partial(step, cfg=cfg, collect_contacts=True))
    w2, m = fc(w)
    m = jax.tree_util.tree_map(np.asarray, m)
    print(f"settled: pen={float(m['max_penetration']):.3f} "
          f"contacts={int(m['num_contacts'])} "
          f"of={int(m['broadphase_overflow'])}")

    stype = np.asarray(w.bodies.shape_type)
    names = {0: "s", 1: "c"}

    pc = m["pair_contacts"]
    i, j = pc["i"], pc["j"]
    c = pc["contact"]
    pen = -((c.b.x - c.a.x) * c.n.x + (c.b.y - c.a.y) * c.n.y
            + (c.b.z - c.a.z) * c.n.z)
    pen = np.where(c.valid, np.maximum(pen, 0.0), 0.0)
    for ta in (0, 1):
        for tb in (0, 1):
            msk = (stype[i][None] == ta) & (stype[j][None] == tb)
            p = pen * msk
            if p.size:
                k = np.unravel_index(np.argmax(p), p.shape)
                print(f"pair {names[ta]}{names[tb]}: n={int((p > 0).sum())} "
                      f"maxpen={p.max():.3f} p99={np.percentile(p[p>0], 99) if (p>0).any() else 0:.3f}")

    tc = m["terrain_contacts"]
    ct = tc["contact"]
    i_t = tc["i"]
    pent = -((ct.b.x - ct.a.x) * ct.n.x + (ct.b.y - ct.a.y) * ct.n.y
             + (ct.b.z - ct.a.z) * ct.n.z)
    pent = np.where(ct.valid, np.maximum(pent, 0.0), 0.0)
    for ta in (0, 1):
        msk = stype[i_t][None] == ta
        p = pent * msk
        print(f"terr {names[ta]}-t: n={int((p > 0).sum())} "
              f"maxpen={p.max():.3f} "
              f"p99={np.percentile(p[p>0], 99) if (p>0).any() else 0:.3f}")

    worst_cterr(w, m, stype)

    # candidate-slot saturation: bodies whose K-th (last) slot is live
    K = cfg.max_pairs
    ok = pc["contact"].valid  # (S, K*N) slot-major flattening
    # pair validity per (K, N): reconstruct from i/j validity is messy;
    # use num live partner slots per body from the contact stream instead
    live = np.zeros(stype.shape[0], np.int32)
    np.add.at(live, i.reshape(-1),
              (pc["contact"].valid.any(0)).astype(np.int32).reshape(-1))
    for t in (0, 1):
        sel = live[stype == t]
        print(f"type {names[t]}: live pair contacts/body mean="
              f"{sel.mean():.2f} p99={np.percentile(sel, 99):.0f} "
              f"max={sel.max()} (K={K})")
        print(f"  bodies at K: {(sel >= K).sum()}")




def worst_cterr(w, m, stype):
    """Dump the worst capsule-terrain offender's geometry."""
    import numpy as np
    tc = m["terrain_contacts"]
    ct = tc["contact"]
    i_t, tri = tc["i"], tc["tri"]
    pent = -((ct.b.x - ct.a.x) * ct.n.x + (ct.b.y - ct.a.y) * ct.n.y
             + (ct.b.z - ct.a.z) * ct.n.z)
    pent = np.where(ct.valid & (stype[i_t][None] == 1),
                    np.maximum(pent, 0.0), 0.0)
    k = np.unravel_index(np.argmax(pent), pent.shape)
    bid = int(i_t[k[1]])
    x = np.asarray(w.bodies.x.x)[bid], np.asarray(w.bodies.x.y)[bid], \
        np.asarray(w.bodies.x.z)[bid]
    print(f"worst c-terr: body {bid} pen={pent.max():.3f} pos="
          f"({x[0]:.2f},{x[1]:.2f},{x[2]:.2f})")
    q = [np.asarray(g)[bid] for g in (w.bodies.q.w, w.bodies.q.x,
                                      w.bodies.q.y, w.bodies.q.z)]
    print(f"  quat wxyz=({q[0]:.3f},{q[1]:.3f},{q[2]:.3f},{q[3]:.3f})")
    mine = i_t == bid
    print(f"  terrain rows for body: {int(mine.sum())} "
          f"valid={int((ct.valid[:, mine]).sum())} "
          f"faces={sorted(set(tri[mine].tolist()))}")
    pens = pent[:, mine]
    print(f"  per-row pen: {np.round(pens[pens>0], 3).tolist()}")
    # pair contacts for the same body
    pc = m["pair_contacts"]
    pi = pc["i"] == bid
    pv = pc["contact"].valid[:, pi]
    print(f"  pair rows valid: {int(pv.sum())}")


if __name__ == "__main__":
    main()
