"""Fused row-solver inner sweeps as a Pallas TPU kernel.

``solve_rows`` (solver.py) freezes the partner velocity term for each
OUTER iteration and runs ``inner_iters`` block-Jacobi sweeps that update
only each body's OWN velocity — so within an outer iteration the columns
(bodies) are fully independent, and the whole inner loop can run
block-by-block in VMEM.  The jnp inner loop re-reads the ~16 (R, N)
constraint channels from HBM every sweep (~77 MB x inner_iters at 100k);
this kernel streams them ONCE per outer iteration and keeps the sweep
state (va, oa, accumulated impulses) resident across sweeps.

Semantics are exactly ``solve_rows``'s single-phase textbook-friction iso
path (solver.rs:220-240 impulse math; scalar isotropic world inverse
inertia — the spheres fast path): same operations in the same order, so
results agree with the jnp path to float addition-order noise.  The jnp
path stays the source of truth; tests assert both agree.

Channel layout of the packed (18, R, N) constraint tensor (see
pack_row_fields): normal(3) t1(3) t2(3) ra(3), then friction, bias,
normal_mass, tangent_mass1, tangent_mass2, valid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 512

# channel indices in the packed (18, R, N) constraint tensor
_NCH = 18


def pack_row_fields(rc) -> jnp.ndarray:
    """Stack the RowConstraints channels the sweep reads into one
    (18, R, N) f32 tensor (built once per step; the kernel streams it once
    per OUTER iteration instead of once per sweep)."""
    v = rc.valid.astype(jnp.float32)
    return jnp.stack([
        rc.normal.x, rc.normal.y, rc.normal.z,
        rc.t1.x, rc.t1.y, rc.t1.z,
        rc.t2.x, rc.t2.y, rc.t2.z,
        rc.ra.x, rc.ra.y, rc.ra.z,
        rc.friction, rc.bias, rc.normal_mass,
        rc.tangent_mass1, rc.tangent_mass2, v,
    ], axis=0)


def _kernel(fields_ref, term_ref, self_ref, s_in_ref, acc_in_ref,
            s_out_ref, acc_out_ref, *, inner_iters: int):
    f = fields_ref[:]                 # (18, R, B)
    nx, ny, nz = f[0], f[1], f[2]
    t1x, t1y, t1z = f[3], f[4], f[5]
    t2x, t2y, t2z = f[6], f[7], f[8]
    rax, ray, raz = f[9], f[10], f[11]
    fric, bias, nm = f[12], f[13], f[14]
    tm1, tm2, valid = f[15], f[16], f[17]
    term = term_ref[:]                # (3, R, B) frozen partner term
    tx, ty, tz = term[0], term[1], term[2]
    sp = self_ref[:]                  # (2, B): inv_mass, iso inv inertia
    ima, ia_s = sp[0], sp[1]
    s0 = s_in_ref[:]                  # (8, B)
    acc0 = acc_in_ref[:]              # (3, R, B): acc_n, acc_t1, acc_t2

    def sweep(_, carry):
        vax, vay, vaz, oax, oay, oaz, acc_n, acc_t1, acc_t2 = carry
        # dv = frozen partner term - (va + oa x ra), broadcast (B,)->(R,B)
        dvx = tx - (vax + oay * raz - oaz * ray)
        dvy = ty - (vay + oaz * rax - oax * raz)
        dvz = tz - (vaz + oax * ray - oay * rax)
        # friction first (single-phase: both from the same dv)
        lam1 = -(dvx * t1x + dvy * t1y + dvz * t1z) * tm1
        lam2 = -(dvx * t2x + dvy * t2y + dvz * t2z) * tm2
        max_l = fric * acc_n
        new1 = jnp.clip(acc_t1 + lam1, -max_l, max_l)
        new2 = jnp.clip(acc_t2 + lam2, -max_l, max_l)
        f1 = new1 - acc_t1
        f2 = new2 - acc_t2
        # projected normal impulse from the same dv
        vn = dvx * nx + dvy * ny + dvz * nz
        lam = nm * (bias - vn)
        new_n = jnp.maximum(acc_n + lam, 0.0)
        fn = new_n - acc_n
        # composite impulse, masked by row validity
        ix = (t1x * f1 + t2x * f2 + nx * fn) * valid
        iy = (t1y * f1 + t2y * f2 + ny * fn) * valid
        iz = (t1z * f1 + t2z * f2 + nz * fn) * valid
        # self body receives -impulse (side a); reduce over rows
        linx = -jnp.sum(ix, axis=0) * ima
        liny = -jnp.sum(iy, axis=0) * ima
        linz = -jnp.sum(iz, axis=0) * ima
        angx = -jnp.sum(ray * iz - raz * iy, axis=0) * ia_s
        angy = -jnp.sum(raz * ix - rax * iz, axis=0) * ia_s
        angz = -jnp.sum(rax * iy - ray * ix, axis=0) * ia_s
        return (vax + linx, vay + liny, vaz + linz,
                oax + angx, oay + angy, oaz + angz,
                jnp.where(valid > 0.0, new_n, acc_n),
                jnp.where(valid > 0.0, new1, acc_t1),
                jnp.where(valid > 0.0, new2, acc_t2))

    init = (s0[0], s0[1], s0[2], s0[3], s0[4], s0[5],
            acc0[0], acc0[1], acc0[2])
    out = jax.lax.fori_loop(0, inner_iters, sweep, init)
    s_out_ref[0:6] = jnp.stack(out[0:6])
    s_out_ref[6:8] = s0[6:8]
    acc_out_ref[:] = jnp.stack(out[6:9])


def inner_sweeps(S, fields, term, self_p, acc, inner_iters: int,
                 interpret: bool = None):
    """Run ``inner_iters`` fused block-Jacobi inner sweeps.

    S        (8, N)  packed body state (rows vx vy vz ox oy oz _ _)
    fields   (18, R, N) from :func:`pack_row_fields`
    term     (3, R, N) frozen partner term (vb + ob x rb)
    self_p   (2, N)  [inv_mass, iso inverse inertia]
    acc      (3, R, N) accumulated impulses (n, t1, t2)

    Returns (S', acc').  N must be a multiple of the 512 block (callers
    pad; padded columns must have valid = 0).
    """
    if interpret is None:
        # CPU (the virtual test mesh) runs the interpreter; real TPUs
        # compile via Mosaic
        interpret = jax.default_backend() == "cpu"
    n = S.shape[1]
    assert n % _BLOCK == 0, n
    grid = (n // _BLOCK,)
    R = fields.shape[1]
    bs = lambda c: pl.BlockSpec((c, R, _BLOCK), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, inner_iters=inner_iters),
        grid=grid,
        in_specs=[
            bs(_NCH),
            bs(3),
            pl.BlockSpec((2, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            bs(3),
        ],
        out_specs=[
            pl.BlockSpec((8, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            bs(3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n), jnp.float32),
            jax.ShapeDtypeStruct((3, R, n), jnp.float32),
        ],
        interpret=interpret,
    )(fields, term, self_p, S, acc)
