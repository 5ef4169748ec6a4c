"""Broadphase collision culling on device.

The reference uses an incremental SAH-balanced AABB tree with fat proxies
(src/bvh.rs + mgf_demo/world.rs:233-238).  Pointer trees and per-object
insert/remove do not map to the TPU, so this module replaces them with a
*modular cell grid* rebuilt every step — the idiomatic fixed-shape design:

1. every body is binned by its swept-AABB center into a cell of side
   ``cell_size``; cells are addressed modulo a power-of-two grid dimension,
   so the table is a dense ``(dim^3, bucket_cap)`` array (no hashing
   collisions *within* any 3x3x3 neighborhood — offsets are < 3 apart, so
   distinct neighbor cells always land in distinct buckets and candidate
   lists contain no duplicates by construction);
2. building the table is a sort + rank + scatter (all O(N log N) on device);
3. candidate partners for a body are the bucket contents of its 27 neighbor
   cells — a dense (N, 27*bucket_cap) gather, masked by an actual swept-AABB
   overlap test (replacing BVH::query, bvh.rs:283-342);
4. ``refine_pairs`` top-k-selects the closest candidates into a fixed
   (N, max_pairs) partner list, the unit the narrowphase/solver consume.

Cells aliasing across the modulus can only *add* candidates (killed by the
AABB test) or overflow buckets (counted and reported in step metrics —
the moral equivalent of the reference's panic-free refit).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mgf_tpu.geom import AABB
from mgf_tpu.math3d import magnitude2


class GridConfig(NamedTuple):
    """Static broadphase configuration (python scalars; jit-static)."""
    cell_size: float
    dim: int = 64          # power of two; table has dim^3 buckets
    bucket_cap: int = 4    # max bodies per bucket


class GridTable(NamedTuple):
    table: jnp.ndarray      # (dim^3, bucket_cap) int32 body index or -1
    overflow: jnp.ndarray   # () int32 — bodies dropped from full buckets


def _cell_coords(centers, cfg: GridConfig):
    return jnp.floor(centers / cfg.cell_size).astype(jnp.int32)


def _bucket_index(coords, cfg: GridConfig):
    m = cfg.dim - 1  # dim is a power of two
    c = coords & m
    return (c[..., 0] * cfg.dim + c[..., 1]) * cfg.dim + c[..., 2]


def build_grid(centers, cfg: GridConfig) -> GridTable:
    """Bin bodies into the modular grid (replaces BVH::insert batch)."""
    n = centers.shape[0]
    h = _bucket_index(_cell_coords(centers, cfg), cfg)
    order = jnp.argsort(h)
    sorted_h = h[order]
    # rank of each body within its bucket run
    first = jnp.searchsorted(sorted_h, sorted_h, side='left')
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    ok = rank < cfg.bucket_cap
    table = jnp.full((cfg.dim ** 3, cfg.bucket_cap), -1, jnp.int32)
    table = table.at[sorted_h, jnp.minimum(rank, cfg.bucket_cap - 1)].set(
        jnp.where(ok, order.astype(jnp.int32), -1), mode='drop')
    return GridTable(table=table, overflow=jnp.sum(~ok).astype(jnp.int32))


_OFFSETS = [(dx, dy, dz)
            for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


def neighbor_candidates(centers, table: GridTable, cfg: GridConfig):
    """(N, 27*bucket_cap) candidate partner indices (-1 = empty slot)."""
    coords = _cell_coords(centers, cfg)
    cols = []
    for off in _OFFSETS:
        h = _bucket_index(coords + jnp.asarray(off, jnp.int32), cfg)
        cols.append(table.table[h])            # (N, bucket_cap)
    return jnp.concatenate(cols, axis=-1)      # (N, 27*bucket_cap)


def refine_pairs(bounds: AABB, cand, max_pairs: int, ordered: bool = True):
    """Cull candidates by swept-AABB overlap and keep the closest
    ``max_pairs`` per body.

    ``bounds`` are the per-body swept fat AABBs; ``cand`` is the
    (N, K) candidate matrix.  ``ordered=True`` keeps only partners with a
    smaller index (the reference's ``collider_i < i`` dedupe,
    world.rs:266-268).  Returns (partner (N, max_pairs) int32, valid mask).
    """
    n = bounds.c.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    safe = jnp.maximum(cand, 0)
    cc = bounds.c[safe]                        # (N, K, 3)
    cr = bounds.r[safe]
    ok = cand >= 0
    ok = ok & (cand != rows)
    if ordered:
        ok = ok & (cand < rows)
    overlap = jnp.all(jnp.abs(cc - bounds.c[:, None, :])
                      <= cr + bounds.r[:, None, :], axis=-1)
    ok = ok & overlap
    # keep the closest max_pairs candidates
    d2 = magnitude2(cc - bounds.c[:, None, :])
    score = jnp.where(ok, -d2, -jnp.inf)
    if cand.shape[1] <= max_pairs:
        pad = max_pairs - cand.shape[1]
        partner = jnp.pad(jnp.where(ok, cand, -1), ((0, 0), (0, pad)),
                          constant_values=-1)
        return partner, partner >= 0
    top, idx = jax.lax.top_k(score, max_pairs)
    partner = jnp.take_along_axis(jnp.where(ok, cand, -1), idx, axis=1)
    valid = jnp.isfinite(top)
    dropped = jnp.sum(ok, axis=1) - jnp.sum(valid, axis=1)
    return jnp.where(valid, partner, -1), valid


def all_pairs_candidates(n: int):
    """O(N^2) candidate matrix for small scenes / parity tests."""
    return jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (n, n))


def swept_fat_bounds(bounds: AABB, delta, fatten: float = 0.0) -> AABB:
    """Swept (combine start/end) + optionally fattened AABB
    (bounds.rs:60-68 + world.rs:237 ``bounds + 0.25``)."""
    lo = jnp.minimum(bounds.c - bounds.r, bounds.c + delta - bounds.r)
    hi = jnp.maximum(bounds.c + bounds.r, bounds.c + delta + bounds.r)
    c = (hi + lo) * 0.5
    r = (hi - lo) * 0.5 + fatten
    return AABB(c=c, r=r)
