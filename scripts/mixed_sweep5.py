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
import jax.numpy as jnp
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
    if name == "bias1":
        return cfg._replace(bias_max=1.0)
    if name == "bias05":
        return cfg._replace(bias_max=0.5)
    if name == "bias02":
        return cfg._replace(bias_max=0.2)
    if name == "bias05cand5":
        return cfg._replace(bias_max=0.5, terrain_cand=5)
    if name == "bias05heavy":
        return cfg._replace(bias_max=0.5, adapt_schedule=None,
                            solver_iters=6, solver_inner=6)
    if name == "cold20":
        # the bench stress_cold20 row's reference-schedule semantics
        return cfg._replace(warm_start=False, fused_iso=False,
                            warm_match="search", adapt_schedule=None,
                            solver_iters=20, solver_inner=1,
                            two_phase=True)
    if name == "search":
        return cfg._replace(warm_match="search")
    if name == "warmheavy":
        # warm ON with the cold schedule's sweep budget: does budget or
        # the warm pre-apply itself drive the agitation?
        return cfg._replace(adapt_schedule=None, solver_iters=10,
                            solver_inner=2)
    if name == "warmnofric":
        # handled by the monkeypatch below (zero tangent accumulators at
        # pre-apply; normal warm kept)
        return cfg
    if name.startswith("warmg"):
        # handled by the monkeypatch below (scale the warm triple)
        return cfg
    if name == "warmcapb":
        # handled by the monkeypatch below (zero warm on the Mat3 block)
        return cfg
    if name.startswith("adapt"):
        # settled-schedule variants: adaptIJ = (0.97, I, J) — deep
        # bottom-layer pen is a convergence equilibrium; outer refreshes
        # propagate load through the stack
        return cfg._replace(
            adapt_schedule=(0.97, int(name[5]), int(name[6:])))
    raise ValueError(name)


def run(name, bodies, steps):
    from mgf_tpu import solver
    frac = 0.25
    vname = name
    mixed = True
    if name.startswith("allcap"):
        frac = 1.0
        vname = name[len("allcap"):].lstrip("_") or "base"
    if name.startswith("spheres"):
        mixed = False
        vname = name[len("spheres"):].lstrip("_") or "base"
    if name.startswith("gen1cap"):
        # 1 capsule in 2000: sphere physics through the MIXED (generic
        # Mat3 + split) solve path — isolates that path's warm handling
        # from capsule geometry
        frac = 1.0 / 1999.0
        vname = name[len("gen1cap"):].lstrip("_") or "base"
    w, cfg = stress_scene(bodies, mixed=mixed, cap_frac=frac)
    solver.BAUMGARTE = 0.0 if vname.startswith("nobias") else 0.2
    if vname.startswith(("nobias", "norest", "nofric")):
        b = w.bodies
        if vname.startswith("norest"):
            b = b._replace(restitution=b.restitution * 0.0)
        if vname.startswith("nofric"):
            b = b._replace(friction=b.friction * 0.0)
        w = w._replace(bodies=b)
        vname = "base"
    import mgf_tpu.world as W
    if not hasattr(W, "_orig_solve_rows"):
        W._orig_solve_rows = W.solve_rows
    if vname == "warmnofric":
        def nf_solve_rows(*a, **k):
            wtr = k.get("warm")
            if wtr is not None:
                k["warm"] = (wtr[0], wtr[1] * 0.0, wtr[2] * 0.0)
            return W._orig_solve_rows(*a, **k)
        W.solve_rows = nf_solve_rows
    elif vname.startswith("warmg"):
        gam = float(vname[len("warmg"):]) / 10.0

        def g_solve_rows(*a, **k):
            wtr = k.get("warm")
            if wtr is not None:
                k["warm"] = tuple(wi * gam for wi in wtr)
            return W._orig_solve_rows(*a, **k)
        W.solve_rows = g_solve_rows
    elif vname == "warmcapb":
        # zero the warm transfer ONLY on the capsule (Mat3 self-inertia)
        # block of the split solve — sphere rows keep full warm
        from mgf_tpu.math3d import Mat3 as _M3

        def cb_solve_rows(*a, **k):
            if k.get("warm") is not None and isinstance(a[4], _M3):
                k["warm"] = tuple(wi * 0.0 for wi in k["warm"])
            return W._orig_solve_rows(*a, **k)
        W.solve_rows = cb_solve_rows
    else:
        W.solve_rows = W._orig_solve_rows
    cfg = variant(vname, cfg)
    w = w._replace(warm=None, bp=None)
    w = init_warm(w, cfg)
    if cfg.bp_every > 1:
        w = init_bp_cache(w, cfg)
    f = jax.jit(functools.partial(step, cfg=cfg))
    for s in range(steps):
        w, m = f(w)
    def stats(w, m, tag):
        x = np.stack([np.asarray(w.bodies.x.x), np.asarray(w.bodies.x.y),
                      np.asarray(w.bodies.x.z)], -1)
        v = np.linalg.norm(np.stack(
            [np.asarray(w.bodies.v.x), np.asarray(w.bodies.v.y),
             np.asarray(w.bodies.v.z)], -1), axis=-1)
        om = np.linalg.norm(np.stack(
            [np.asarray(w.bodies.omega.x), np.asarray(w.bodies.omega.y),
             np.asarray(w.bodies.omega.z)], -1), axis=-1)
        st = np.asarray(w.bodies.shape_type)
        wall = float(np.asarray(w.terrain.a.x).max())
        esc = int(np.sum((x[:, 1] < -2.0) | (np.abs(x[:, 0]) > wall + 1)
                         | (np.abs(x[:, 2]) > wall + 1)))
        per = " ".join(
            f"{nm}|v|={v[st == t].mean():.3f},|om|={om[st == t].mean():.2f}"
            for t, nm in ((0, "s"), (1, "c")) if (st == t).any())
        print(f"{name:8s}{tag} pen={float(np.asarray(m['max_penetration'])):.3f} "
              f"contacts={int(np.asarray(m['num_contacts']))} "
              f"mean|v|={v.mean():.3f} p99|v|={np.percentile(v, 99):.2f} "
              f"max|v|={v.max():.1f} escaped={esc} "
              f"warm_hit={float(np.asarray(m.get('warm_hit_frac', 0.0))):.3f}"
              f" {per}",
              flush=True)

    stats(w, m, "")
    # freeze test: zero every velocity at the settled state and step 60
    # more — if agitation REBUILDS from rest the injector is geometric
    # (contact stream / bias); if it stays calm it is a velocity-borne
    # cascade (restitution / impulse overshoot)
    b = w.bodies
    z = jax.tree_util.tree_map(jnp.zeros_like, b.v)
    w = w._replace(bodies=b._replace(v=z, omega=z, delta=z))
    for s in range(60):
        w, m = f(w)
    stats(w, m, "+frz60")


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
