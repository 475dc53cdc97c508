"""Vectorized ray-AABB slab test.

Reference: ``ray_aabb_intersect`` (src/hit.c:49-82). The reference special-
cases zero direction components to +/-inf slabs; in IEEE float arithmetic,
dividing by +/-0 yields +/-inf with the same min/max outcome *except* when the
origin lies exactly on the slab plane (0/0 = NaN), so we use a precomputed
safe inverse direction that reproduces the reference's branch exactly while
staying branch-free.

Returns the (tmin, tmax) interval rather than a bool so the traversal can add
ordered-descent and best-t pruning (a pure win over the reference's unordered
recursion, SURVEY.md 3.4). The reference's acceptance is
``tmax >= tmin && tmax > EPSILON``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

_HUGE = jnp.float32(3.0e38)  # finite stand-in for the +/-inf slab


def safe_inv_dir(direction: Array) -> Array:
    """1/d with the reference's zero-component convention: a zero component
    means the slab test is a pass-through (+/-inf interval) regardless of
    origin, which ``(box - o) * +/-HUGE`` reproduces without NaNs."""
    return jnp.where(direction == 0.0, _HUGE, 1.0 / jnp.where(direction == 0.0, 1.0, direction))


def ray_aabb_interval(origin: Array, inv_dir: Array, box_min: Array,
                      box_max: Array):
    """Slab-test interval (tmin, tmax); broadcasts over batch shapes.

    origin/inv_dir ``(..., 3)``; box_min/box_max ``(..., 3)``.
    Hit iff ``(tmax >= tmin) & (tmax > eps)`` (src/hit.c:81).
    """
    t1 = (box_min - origin) * inv_dir
    t2 = (box_max - origin) * inv_dir
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return tmin, tmax
