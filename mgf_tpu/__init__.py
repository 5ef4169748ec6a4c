"""mgf_tpu — a TPU-native 3D collision-detection and rigid-body physics engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of ``maplant/mgf``
(a Rust collision/physics library; reference layout in /root/reference):

* shapes live in structure-of-arrays pytrees (``geom``),
* narrowphase collision tests are branch-free vmapped kernels (``collision``),
* GJK/EPA run as fixed-iteration ``lax.while_loop`` kernels (``gjk``),
* the broadphase is an on-device hashed cell list / morton sort (``broadphase``),
* rigid bodies are one SoA pytree integrated on device (``physics``),
* contacts are resolved by a fixed-iteration impulse solver (``solver``),
* a whole physics step is one jitted function (``world``).

Reference parity: each public function cites the mgf item (file:line) whose
behaviour it reproduces.
"""

from mgf_tpu import math3d
from mgf_tpu.math3d import COLLISION_EPSILON
from mgf_tpu.geom import (
    Plane, Ray, Segment, Triangle, Tetrahedron, Rectangle, AABB, OBB, Sphere,
    Capsule, Moving, compute_basis, closest_pts_seg,
)
from mgf_tpu import geom
from mgf_tpu import bounds
from mgf_tpu import collision
from mgf_tpu.collision import Contact, LocalContact, Intersection

__version__ = "0.1.0"
