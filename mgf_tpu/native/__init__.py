"""ctypes bindings for the native host runtime (csrc/mgf_host.cpp).

Compiled on demand with g++ into ``csrc/libmgf_host.so`` (cached); every
function has a pure-numpy fallback so the engine works without a toolchain.

Provided:
* :func:`morton_order` — spatial sort permutation for bodies,
* :func:`build_cell_table` — host-side static mesh face grid build,
* :func:`weld_vertices` — mesh vertex dedup,
* :class:`AabbTree` — median-split AABB tree over triangles with overlap
  queries (the host-side bvh.rs equivalent for tooling).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "mgf_host.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                   "libmgf_host.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)

    def compile_so():
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", so],
            check=True, capture_output=True)

    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            compile_so()
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            # a stale/foreign-arch .so (e.g. from a copied checkout):
            # rebuild from source once and retry before giving up
            compile_so()
            lib = ctypes.CDLL(so)
    except Exception:
        _lib = False
        return False

    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.morton_order.argtypes = [f32p, i64, i32p]
    lib.build_cell_table.argtypes = [f32p, i64, i32p, i64, ctypes.c_float,
                                     ctypes.c_int32, ctypes.c_int32, i32p]
    lib.build_cell_table.restype = i64
    lib.weld_vertices.argtypes = [f32p, i64, ctypes.c_float, i32p, f32p]
    lib.weld_vertices.restype = i64
    lib.aabb_tree_build.argtypes = [f32p, i64, i32p, i64, f32p, i32p, i32p]
    lib.aabb_tree_build.restype = i64
    lib.aabb_tree_query.argtypes = [f32p, i32p, i32p, i64, f32p, f32p, i32p,
                                    i64]
    lib.aabb_tree_query.restype = i64
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.solve_contacts_f64.argtypes = [
        f64p, f64p, f64p, f64p, i64,          # v omega inv_mass inv_moment M
        i32p, i32p,                           # body_a body_b
        f64p, f64p, f64p, f64p, f64p,         # ra rb normal t1 t2
        f64p, f64p, f64p, f64p, f64p,         # friction bias nm tm1 tm2
        i64, ctypes.c_int32, ctypes.c_int32]  # C iters mgf_friction
    _lib = lib
    return lib


def native_available() -> bool:
    return bool(_load())


def morton_order(pos) -> np.ndarray:
    """Permutation sorting positions (n, 3) by 30-bit morton code."""
    pos = np.ascontiguousarray(pos, np.float32)
    n = pos.shape[0]
    lib = _load()
    if lib:
        out = np.empty(n, np.int32)
        lib.morton_order(pos, n, out)
        return out
    # numpy fallback
    lo = pos.min(0)
    rng = np.maximum(pos.max(0) - lo, 1e-9)
    q = np.clip(((pos - lo) / rng * 1023.0), 0, 1023).astype(np.uint32)

    def expand(v):
        v = (v * 0x00010001) & 0xFF0000FF
        v = (v * 0x00000101) & 0x0F00F00F
        v = (v * 0x00000011) & 0xC30C30C3
        v = (v * 0x00000005) & 0x49249249
        return v
    code = (expand(q[:, 0]) << 2) | (expand(q[:, 1]) << 1) | expand(q[:, 2])
    return np.argsort(code, kind="stable").astype(np.int32)


def build_cell_table(verts, faces, cell_size: float, dim: int, cap: int):
    """(dim^3, cap) int32 face table (+ overflow count), host-built."""
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    table = np.full((dim ** 3, cap), -1, np.int32)
    lib = _load()
    if lib:
        overflow = lib.build_cell_table(verts, verts.shape[0], faces,
                                        faces.shape[0], cell_size, dim, cap,
                                        table)
        return table, int(overflow)
    # numpy fallback
    cent = verts[faces].mean(axis=1)
    cc = np.floor(cent / cell_size).astype(np.int64) & (dim - 1)
    bucket = (cc[:, 0] * dim + cc[:, 1]) * dim + cc[:, 2]
    overflow = 0
    fill = {}
    for f, b in enumerate(bucket):
        k = fill.get(b, 0)
        if k < cap:
            table[b, k] = f
            fill[b] = k + 1
        else:
            overflow += 1
    return table, overflow


def weld_vertices(verts, tol: float = 1e-6):
    """Dedup a vertex soup; returns (new_verts, remap old->new)."""
    verts = np.ascontiguousarray(verts, np.float32)
    n = verts.shape[0]
    lib = _load()
    if lib:
        remap = np.empty(n, np.int32)
        out = np.empty_like(verts)
        count = lib.weld_vertices(verts, n, tol, remap, out)
        return out[:count].copy(), remap
    key = np.round(verts / max(tol, 1e-12)).astype(np.int64)
    _, first, remap = np.unique(key, axis=0, return_index=True,
                                return_inverse=True)
    # remap indexes np.unique's KEY-SORTED order, so the welded verts must
    # be emitted in that same order (sorting `first` here would scramble
    # welded[remap] whenever first-occurrence and key order differ)
    return verts[first], remap.astype(np.int32)


def solve_contacts_f64(v, omega, inv_mass, inv_moment, body_a, body_b,
                       ra, rb, normal, t1, t2, friction, bias, normal_mass,
                       tm1, tm2, iters: int, mgf_friction: bool):
    """Reference-exact sequential-impulse Gauss-Seidel sweeps in f64
    (solver.rs:203-253 semantics) — the parity oracle's inner loop.

    ``v``/``omega`` are (M, 3) float64 and are updated IN PLACE when the
    native library is available; the pure-python fallback returns updated
    copies either way.  Returns (v, omega).
    """
    M = v.shape[0]
    C = body_a.shape[0]
    v = np.ascontiguousarray(v, np.float64)
    omega = np.ascontiguousarray(omega, np.float64)
    args = [np.ascontiguousarray(a, np.float64)
            for a in (inv_mass, inv_moment, ra, rb, normal, t1, t2,
                      friction, bias, normal_mass, tm1, tm2)]
    (inv_mass, inv_moment, ra, rb, normal, t1, t2, friction, bias,
     normal_mass, tm1, tm2) = args
    body_a = np.ascontiguousarray(body_a, np.int32)
    body_b = np.ascontiguousarray(body_b, np.int32)
    lib = _load()
    if lib:
        lib.solve_contacts_f64(v, omega, inv_mass,
                               inv_moment.reshape(M, 9), M, body_a, body_b,
                               ra, rb, normal, t1, t2, friction, bias,
                               normal_mass, tm1, tm2, C, int(iters),
                               int(bool(mgf_friction)))
        return v, omega
    # pure-python fallback (slow; small scenes only)
    acc_n = np.zeros(C)
    acc_t1 = np.zeros(C)
    acc_t2 = np.zeros(C)
    I3 = inv_moment.reshape(M, 3, 3)
    for _ in range(int(iters)):
        for c in range(C):
            a, b = int(body_a[c]), int(body_b[c])

            def apply(direction, lam):
                imp = direction * lam
                v[a] -= imp * inv_mass[a]
                omega[a] -= I3[a] @ np.cross(ra[c], imp)
                v[b] += imp * inv_mass[b]
                omega[b] += I3[b] @ np.cross(rb[c], imp)

            def rel():
                return (v[b] + np.cross(omega[b], rb[c])
                        - v[a] - np.cross(omega[a], ra[c]))

            dv = rel()
            lam1 = -dv @ t1[c] * tm1[c]
            lam2 = -dv @ t2[c] * tm2[c]
            if mgf_friction:
                app1, app2 = lam1, lam2
                acc_t1[c] += lam1
                acc_t2[c] += lam2
            else:
                max_l = friction[c] * acc_n[c]
                n1 = np.clip(acc_t1[c] + lam1, -max_l, max_l)
                n2 = np.clip(acc_t2[c] + lam2, -max_l, max_l)
                app1, app2 = n1 - acc_t1[c], n2 - acc_t2[c]
                acc_t1[c], acc_t2[c] = n1, n2
            apply(t1[c], app1)
            apply(t2[c], app2)
            dv = rel()
            lam = normal_mass[c] * (-(dv @ normal[c]) + bias[c])
            new_acc = max(acc_n[c] + lam, 0.0)
            apply(normal[c], new_acc - acc_n[c])
            acc_n[c] = new_acc
    return v, omega


class AabbTree:
    """Host-side median-split AABB tree over triangles (bvh.rs tooling
    equivalent: build + overlap query)."""

    def __init__(self, verts, faces):
        verts = np.ascontiguousarray(verts, np.float32)
        faces = np.ascontiguousarray(faces, np.int32)
        t = faces.shape[0]
        n_nodes = max(2 * t - 1, 1)
        self.bounds = np.zeros((n_nodes, 6), np.float32)
        self.children = np.full((n_nodes, 2), -1, np.int32)
        self.leaf_face = np.full(n_nodes, -1, np.int32)
        lib = _load()
        if lib and t > 0:
            self.n_nodes = int(lib.aabb_tree_build(
                verts, verts.shape[0], faces, t, self.bounds,
                self.children, self.leaf_face))
            self._native = True
        else:
            self._native = False
            self._verts, self._faces = verts, faces
            self.n_nodes = 0

    def query(self, center, radius, cap: int = 256) -> np.ndarray:
        """Face ids whose AABBs overlap the query box (center, radius)."""
        qc = np.ascontiguousarray(center, np.float32)
        qr = np.ascontiguousarray(radius, np.float32)
        if self._native:
            out = np.empty(cap, np.int32)
            lib = _load()
            cnt = lib.aabb_tree_query(self.bounds, self.children,
                                      self.leaf_face, self.n_nodes, qc, qr,
                                      out, cap)
            return out[:cnt].copy()
        tri = self._verts[self._faces]        # (t, 3, 3)
        lo = tri.min(1)
        hi = tri.max(1)
        hit = np.all((lo <= qc + qr) & (hi >= qc - qr), axis=1)
        return np.nonzero(hit)[0].astype(np.int32)[:cap]
