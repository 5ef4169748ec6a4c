"""Contact pruning and manifold construction.

TPU-native counterpart of ``src/manifold.rs``: per body-pair, keep only the
contacts at the earliest time of impact (within COLLISION_EPSILON) and drop
points closer than PERSISTENT_THRESHOLD to an already-kept point, preferring
the point farther from the bodies' centers.  The dynamic SmallVec of the
reference becomes MAX_CONTACTS fixed slots with validity masks, and the
sequential push loop (manifold.rs:72-102) is unrolled branch-free over the
incoming contact slots.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mgf_tpu.collision import LocalContact
from mgf_tpu.geom import compute_basis
from mgf_tpu.math3d import (
    COLLISION_EPSILON, magnitude2, safe_div, where_vec,
)

# manifold.rs:38
PERSISTENT_THRESHOLD_SQ = 0.5
# manifold.rs:117 (SmallVec inline size; the solver consumes up to 4 points)
MAX_CONTACTS = 4


class Manifold(NamedTuple):
    """A set of contacts between two objects (manifold.rs:112-118).

    Slot arrays have a trailing slot axis of MAX_CONTACTS.
    """
    time: jnp.ndarray            # (...,)
    normal: jnp.ndarray          # (..., 3) averaged contact normal
    tangent: jnp.ndarray         # (..., 2, 3) friction basis
    local_a: jnp.ndarray         # (..., S, 3)
    local_b: jnp.ndarray         # (..., S, 3)
    valid: jnp.ndarray           # (..., S) bool


def prune(lc: LocalContact, max_contacts: int = MAX_CONTACTS) -> Manifold:
    """Build a Manifold from a slot axis of LocalContacts.

    ``lc`` fields carry a leading slot axis S (e.g. 2 for capsule/polygon
    routines); invalid slots are skipped.  Reproduces ContactPruner::push
    (manifold.rs:72-102) + Manifold::from (manifold.rs:131-148).
    """
    S = lc.contact.t.shape[0]
    batch = lc.contact.t.shape[1:]

    inf = jnp.float32(jnp.inf)
    min_t = jnp.full(batch, inf)
    kept_ga = [jnp.zeros(batch + (3,)) for _ in range(max_contacts)]
    kept_gb = [jnp.zeros(batch + (3,)) for _ in range(max_contacts)]
    kept_la = [jnp.zeros(batch + (3,)) for _ in range(max_contacts)]
    kept_lb = [jnp.zeros(batch + (3,)) for _ in range(max_contacts)]
    kept_n = [jnp.zeros(batch + (3,)) for _ in range(max_contacts)]
    kept_ok = [jnp.zeros(batch, bool) for _ in range(max_contacts)]

    for s in range(S):
        c = lc.contact.t[s]
        ok = lc.contact.valid[s]
        ga, gb = lc.contact.a[s], lc.contact.b[s]
        la, lb = lc.local_a[s], lc.local_b[s]
        nn = lc.contact.n[s]

        earlier = ok & (c < min_t - COLLISION_EPSILON)
        later = c > min_t + COLLISION_EPSILON
        same = ok & ~earlier & ~later

        # earlier: clear all slots, write slot 0
        # same: proximity-match against kept slots in order; replace the first
        #       close one if the new point is farther out, else append.
        new_dist = magnitude2(la) + magnitude2(lb)
        matched = jnp.zeros(batch, bool)
        for k in range(max_contacts):
            close = (kept_ok[k]
                     & ((magnitude2(ga - kept_ga[k])
                         <= PERSISTENT_THRESHOLD_SQ)
                        | (magnitude2(gb - kept_gb[k])
                           <= PERSISTENT_THRESHOLD_SQ)))
            hit = same & ~matched & close
            replace = hit & ((magnitude2(kept_la[k]) + magnitude2(kept_lb[k]))
                             < new_dist)
            kept_ga[k] = where_vec(replace, ga, kept_ga[k])
            kept_gb[k] = where_vec(replace, gb, kept_gb[k])
            kept_la[k] = where_vec(replace, la, kept_la[k])
            kept_lb[k] = where_vec(replace, lb, kept_lb[k])
            kept_n[k] = where_vec(replace, nn, kept_n[k])
            matched = matched | hit

        append = same & ~matched
        placed = jnp.zeros(batch, bool)
        for k in range(max_contacts):
            free = append & ~placed & ~kept_ok[k]
            kept_ga[k] = where_vec(free, ga, kept_ga[k])
            kept_gb[k] = where_vec(free, gb, kept_gb[k])
            kept_la[k] = where_vec(free, la, kept_la[k])
            kept_lb[k] = where_vec(free, lb, kept_lb[k])
            kept_n[k] = where_vec(free, nn, kept_n[k])
            kept_ok[k] = kept_ok[k] | free
            placed = placed | free

        # earlier wipes everything and installs in slot 0
        for k in range(max_contacts):
            kept_ok[k] = jnp.where(earlier, k == 0, kept_ok[k])
            kept_ga[k] = where_vec(earlier & (k == 0), ga, kept_ga[k])
            kept_gb[k] = where_vec(earlier & (k == 0), gb, kept_gb[k])
            kept_la[k] = where_vec(earlier & (k == 0), la, kept_la[k])
            kept_lb[k] = where_vec(earlier & (k == 0), lb, kept_lb[k])
            kept_n[k] = where_vec(earlier & (k == 0), nn, kept_n[k])
        min_t = jnp.where(earlier, c, min_t)

    ok_stack = jnp.stack(kept_ok, axis=-1)                 # (..., S)
    count = jnp.sum(ok_stack, axis=-1)
    n_sum = sum(where_vec(kept_ok[k], kept_n[k], jnp.zeros_like(kept_n[k]))
                for k in range(max_contacts))
    avg_n = n_sum * jnp.expand_dims(
        safe_div(1.0, count.astype(n_sum.dtype)), -1)
    t1, t2 = compute_basis(avg_n)
    return Manifold(
        time=jnp.where(jnp.isfinite(min_t), min_t, 0.0),
        normal=avg_n,
        tangent=jnp.stack([t1, t2], axis=-2),
        local_a=jnp.stack(kept_la, axis=-2),
        local_b=jnp.stack(kept_lb, axis=-2),
        valid=ok_stack,
    )


def manifold_from_local_contact(lc: LocalContact) -> Manifold:
    """Manifold::from(LocalContact) (manifold.rs:120-129) — single point."""
    import jax.tree_util as jtu
    one = jtu.tree_map(lambda x: jnp.expand_dims(x, 0), lc)
    return prune(one, max_contacts=MAX_CONTACTS)
