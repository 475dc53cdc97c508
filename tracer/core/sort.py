"""Ray sorting for packet coherence.

The Pallas traversal kernel shares one tree-walk cursor per 1024-ray packet
(tracer/kernels/traverse_pallas.py), so a packet's cost is the *union* of its
rays' visited nodes. Random ray order makes every packet visit the whole
tree; sorting rays so neighbors point the same way collapses the union back
toward the per-ray visit set. This is the wavefront analog of the reference's
implicit coherence (its pixel loop walks scanlines; src/main.c:358-365).

Rays are keyed by a Morton interleave of the quantized direction (and
optionally origin); sorting is one XLA sort; the inverse permutation restores
caller order afterwards.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from tracer.core.types import Ray


def _part_bits(v: Array) -> Array:
    """Spread 8 bits of v over 24 bits (2 zero bits between each)."""
    v = v.astype(jnp.uint32) & 0xFF
    v = (v | (v << 8)) & 0x00F00F
    v = (v | (v << 4)) & 0x0C30C3
    v = (v | (v << 2)) & 0x249249
    return v


def direction_morton_codes(d: Array, bits: int = 8) -> Array:
    """Morton code of unit directions, (B,) uint32. 8 bits per component."""
    q = jnp.clip((d * 0.5 + 0.5) * (2 ** bits - 1), 0, 2 ** bits - 1)
    q = q.astype(jnp.uint32)
    return (_part_bits(q[:, 0]) | (_part_bits(q[:, 1]) << 1)
            | (_part_bits(q[:, 2]) << 2))


def sort_rays_by_direction(rays: Ray):
    """Sort a flat ray batch by direction Morton code.

    Returns (sorted_rays, inverse_permutation): apply
    ``result[inverse_permutation]`` to map kernel outputs back to the
    caller's ray order.
    """
    o = rays.origin.reshape(-1, 3)
    d = rays.direction.reshape(-1, 3)
    code = direction_morton_codes(d)
    perm = jnp.argsort(code)
    inv = jnp.argsort(perm)
    return Ray(origin=o[perm], direction=d[perm]), inv
