"""TRUE geometric interpenetration of a settled checkpoint, computed in
f64 numpy independent of the engine's contact witnesses: for every body
pair within reach, overlap = r_sum - distance(segment, segment) (exact
for sphere/capsule; a sphere is a zero-length segment), and for terrain
overlap = r - distance(segment, floor/wall planes clipped to the box
faces).  Distinguishes "the metric reports deep penetration" (witness
construction) from "bodies genuinely interpenetrate" (solver not
converging).

Usage: JAX_PLATFORMS=cpu python scripts/pen_truth.py /tmp/mixed100k.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def seg_seg_dist(p1, q1, p2, q2):
    """Batched segment-segment distance (Ericson 5.1.9), f64."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = np.einsum("ij,ij->i", d1, d1)
    e = np.einsum("ij,ij->i", d2, d2)
    f = np.einsum("ij,ij->i", d2, r)
    c = np.einsum("ij,ij->i", d1, r)
    b = np.einsum("ij,ij->i", d1, d2)
    den = a * e - b * b
    s = np.where(den > 1e-12, np.clip((b * f - c * e)
                                      / np.where(den > 1e-12, den, 1.0),
                                      0.0, 1.0), 0.0)
    t = (b * s + f) / np.where(e > 1e-12, e, 1.0)
    t_cl = np.clip(t, 0.0, 1.0)
    s = np.where(e > 1e-12,
                 np.clip((b * t_cl - c) / np.where(a > 1e-12, a, 1.0),
                         0.0, 1.0), s)
    # zero-length guards: recompute closest with final s, t
    t = np.clip((b * s + f) / np.where(e > 1e-12, e, 1.0), 0.0, 1.0)
    cp1 = p1 + d1 * s[:, None]
    cp2 = p2 + d2 * t[:, None]
    return np.linalg.norm(cp1 - cp2, axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--bodies", type=int, default=100_000)
    args = ap.parse_args()

    from mgf_tpu.physics import capsule_axis
    from mgf_tpu.scenes import stress_scene
    from mgf_tpu.utils.checkpoint import load_world

    like, cfg = stress_scene(args.bodies, mixed=True)
    w = load_world(args.ckpt, like)
    st = w.bodies
    v3 = lambda v: np.stack([np.asarray(v.x), np.asarray(v.y),
                             np.asarray(v.z)], -1).astype(np.float64)
    x = v3(st.x)
    dh = v3(capsule_axis(st))
    r = np.asarray(st.shape_r, np.float64)
    stype = np.asarray(st.shape_type)
    vel = np.linalg.norm(v3(st.v), axis=-1)
    p1 = x - dh          # segment endpoints (spheres: dh = 0)
    q1 = x + dh
    n = x.shape[0]

    # cell hash at 1.6 (max pair reach ~1.5): exact neighbor coverage
    cell = 1.6
    ci = np.floor(x / cell).astype(np.int64)

    import collections
    cellmap = collections.defaultdict(list)
    for i in range(n):
        cellmap[(ci[i, 0], ci[i, 1], ci[i, 2])].append(i)

    best = np.zeros(n)
    best_j = np.full(n, -1)
    offs = [(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1)
            for c in (-1, 0, 1)]
    ii = []
    jj = []
    for (cx, cy, cz), mem in cellmap.items():
        mem = np.asarray(mem)
        neigh = []
        for (dx, dy, dz) in offs:
            neigh.extend(cellmap.get((cx + dx, cy + dy, cz + dz), ()))
        neigh = np.asarray(neigh)
        pi = np.repeat(mem, len(neigh))
        pj = np.tile(neigh, len(mem))
        keep = pi < pj
        ii.append(pi[keep])
        jj.append(pj[keep])
    ii = np.concatenate(ii)
    jj = np.concatenate(jj)
    d = seg_seg_dist(p1[ii], q1[ii], p1[jj], q1[jj])
    ov = np.maximum(r[ii] + r[jj] - d, 0.0)
    np.maximum.at(best, ii, ov)
    np.maximum.at(best, jj, ov)

    # terrain true overlap: box floor y=0 and 4 walls
    wall = float(np.asarray(w.terrain.a.x).max())
    lo_y = np.minimum(p1[:, 1], q1[:, 1])
    t_ov = np.maximum(r - lo_y, 0.0)                      # floor
    for ax in (0, 2):
        hi = np.maximum(p1[:, ax], q1[:, ax])
        lo = np.minimum(p1[:, ax], q1[:, ax])
        t_ov = np.maximum(t_ov, np.maximum(hi + r - wall, 0.0))
        t_ov = np.maximum(t_ov, np.maximum(-wall - lo + r, 0.0))

    tot = np.maximum(best, t_ov)
    print(f"TRUE geometric overlap: max={tot.max():.3f} "
          f"p99.9={np.percentile(tot, 99.9):.3f} "
          f"p99={np.percentile(tot, 99):.3f} p90={np.percentile(tot, 90):.3f}")
    for t, nm in ((0, "sphere"), (1, "capsule")):
        sel = stype == t
        print(f"  {nm}: max={tot[sel].max():.3f} "
              f"p99={np.percentile(tot[sel], 99):.3f} "
              f"pairs_max={best[sel].max():.3f} "
              f"terr_max={t_ov[sel].max():.3f}")
    k = np.argsort(-tot)[:8]
    for b in k:
        print(f"  worst body {b} type={stype[b]} ov={tot[b]:.3f} "
              f"(pair {best[b]:.3f} terr {t_ov[b]:.3f}) "
              f"pos=({x[b,0]:.2f},{x[b,1]:.2f},{x[b,2]:.2f}) |v|={vel[b]:.2f}")
    print(f"bodies with true overlap > 0.3: {(tot > 0.3).sum()}, "
          f"> 0.2: {(tot > 0.2).sum()}; mean |v| {vel.mean():.3f} "
          f"p99 |v| {np.percentile(vel, 99):.2f}")


if __name__ == "__main__":
    main()
