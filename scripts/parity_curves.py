"""Generate the PARITY.md drift curves: full balls/capsule-scene parity
runs against the f64 oracle.

Per-step resync mode: the oracle advances the trajectory; each step the
f32 production step consumes the oracle state, and contact streams +
one-step velocity outputs are diffed.

Usage: JAX_PLATFORMS=cpu python scripts/parity_curves.py [--steps 200]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--num", type=int, default=11)
    args = ap.parse_args()

    from mgf_tpu import oracle
    from mgf_tpu.scenes import balls_scene
    from mgf_tpu.world import step
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from test_oracle import _pair_set, _terrain_set, _oracle_sets

    world, cfg = balls_scene(num=args.num, with_dropped=True)
    f = jax.jit(functools.partial(step, cfg=cfg, collect_contacts=True))
    ow = oracle.from_world(world)

    print("step,contacts,miss,dt_max,dn_max,dp_max,dv_max")
    t0 = time.perf_counter()
    for s in range(args.steps):
        w_in = oracle.to_world(ow, world)
        w, m = f(w_in)
        ow, rec = oracle.oracle_step(ow, dt=cfg.dt, iters=cfg.solver_iters,
                                     mgf_friction=True)
        jp, jt = _pair_set(m), _terrain_set(m)
        op, ot = _oracle_sets(rec)
        miss = 0
        total = 0
        dt_m = dn_m = dp_m = 0.0
        for (js, os_) in ((jp, op), (jt, ot)):
            common = js.keys() & os_.keys()
            miss += len((js.keys() | os_.keys()) - common)
            total += max(len(js), len(os_), 1)
            for key in common:
                tj, nj, aj, bj = js[key]
                to, no, ao, bo = os_[key]
                dt_m = max(dt_m, abs(tj - to))
                dn_m = max(dn_m, float(np.abs(nj - no).max()))
                dp_m = max(dp_m, float(np.abs(aj - ao).max()),
                           float(np.abs(bj - bo).max()))
        dv = float(np.abs(np.asarray(w.bodies.v.y) - ow.v[:, 1]).max())
        if s % 10 == 0 or miss:
            print(f"{s},{total},{miss},{dt_m:.2e},{dn_m:.2e},"
                  f"{dp_m:.2e},{dv:.2e}", flush=True)
    print(f"# wall {time.perf_counter()-t0:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
