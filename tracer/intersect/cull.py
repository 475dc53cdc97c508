"""Packet-frustum culling against BVH leaf AABBs (phase A of the cull path).

TPU-native alternative to walking the tree per packet. The packet-traversal
kernel (tracer/kernels/traverse_pallas.py) pays a vector->scalar round trip
per visited node (~350 ns measured on v5e) because each step's ``any(hit)``
must reach the scalar core before the next cursor is known. This module
removes data-dependent traversal entirely:

  * every 1024-ray packet gets conservative interval bounds (origin box +
    direction box);
  * the bounds are slab-tested against **all leaf AABBs at once** with
    interval arithmetic -- one dense (packets x leaves) elementwise
    computation that XLA fuses and vectorizes with zero scalar syncs;
  * surviving leaves are grouped into 128-primitive *tiles* (consecutive
    leaves in DFS preorder share a tile, so survivors cluster), and each
    packet receives a fixed-size candidate tile list via ``top_k``.

Phase B (tracer/kernels/cull_pallas.py) then intersects each packet against
its candidate tiles with a fixed-trip-count loop -- no per-step decisions.

The test is *conservative*: interval arithmetic over-approximates every
per-ray slab test (see test_cull.py::test_cull_is_conservative), so a
(ray, prim) hit can never be lost as long as the per-packet survivor count
fits the candidate budget K; the returned ``overflow`` flag reports when it
does not and the driver escalates K. Hierarchy is still the SAH BVH's --
the leaf boxes culled against are exactly the tree's leaves (reference
builds them at src/bvh.c:117-137).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from tracer.bvh.flat import FlatBVH
from tracer.intersect.sphere import EPSILON

LANES = 128
PACKET = 8 * LANES

# Finite stand-in for +/-inf: keeps interval products NaN-free while still
# dwarfing any real scene coordinate.
_BIG = 1.0e18


@flax.struct.dataclass
class LeafTable:
    """Leaf AABBs laid out in prim-slot order, padded to whole 128-slot tiles.

    leaf_min/leaf_max: (L, 3) f32, leaf ``i`` owns prim slots
        [i*leaf_size, (i+1)*leaf_size). Padding leaves hold inverted boxes
        (min > max), but the symmetric interval slab test accepts an
        inverted box as all-space (ADVICE r2), so ``packet_leaf_hit``
        masks slots >= num_leaves explicitly.
    leaf_size: static; must divide 128 so a tile is a whole number of leaves.
    num_tiles: static L * leaf_size // 128.
    num_leaves: static count of REAL leaves (padding slots above).
    """

    leaf_min: Array
    leaf_max: Array
    leaf_size: int = flax.struct.field(pytree_node=False)
    num_tiles: int = flax.struct.field(pytree_node=False)
    num_leaves: int = flax.struct.field(pytree_node=False, default=-1)


def build_leaf_table(bvh: FlatBVH) -> LeafTable:
    """Extract per-leaf AABBs from a FlatBVH into slot order (host, once)."""
    assert LANES % bvh.leaf_size == 0, "leaf_size must divide 128"
    leaf_start = np.asarray(bvh.leaf_start)
    node_min = np.asarray(bvh.node_min)
    node_max = np.asarray(bvh.node_max)

    is_leaf = leaf_start >= 0
    order = leaf_start[is_leaf] // bvh.leaf_size
    num_leaves = int(order.max()) + 1 if is_leaf.any() else 0

    lpt = LANES // bvh.leaf_size
    L = max(lpt, -(-num_leaves // lpt) * lpt)
    lmin = np.full((L, 3), _BIG, np.float32)
    lmax = np.full((L, 3), -_BIG, np.float32)
    lmin[order] = node_min[is_leaf]
    lmax[order] = node_max[is_leaf]
    return LeafTable(leaf_min=jnp.asarray(lmin), leaf_max=jnp.asarray(lmax),
                     leaf_size=bvh.leaf_size,
                     num_tiles=L * bvh.leaf_size // LANES,
                     num_leaves=num_leaves)


def packet_bounds(origin: Array, direction: Array):
    """Conservative per-packet bounds. (B, 3) -> four (P, 3) arrays."""
    o = origin.reshape(-1, PACKET, 3)
    d = direction.reshape(-1, PACKET, 3)
    return o.min(1), o.max(1), d.min(1), d.max(1)


def _interval_mul(al, ah, bl, bh):
    """[al,ah] * [bl,bh] -> (lo, hi), the exact interval product."""
    p1, p2, p3, p4 = al * bl, al * bh, ah * bl, ah * bh
    lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
    hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
    return lo, hi


def packet_leaf_hit(o_lo, o_hi, d_lo, d_hi, table: LeafTable) -> Array:
    """Conservative slab test of packet bounds vs every leaf box.

    Args are (P, 3); returns (P, L) bool -- True whenever ANY ray within the
    bounds COULD satisfy the reference's AABB acceptance
    (tmax >= tmin && tmax > EPSILON, src/hit.c:81).
    """
    lo = table.leaf_min[None, :, :]              # (1, L, 3)
    hi = table.leaf_max[None, :, :]
    o_lo, o_hi = o_lo[:, None, :], o_hi[:, None, :]   # (P, 1, 3)
    d_lo, d_hi = d_lo[:, None, :], d_hi[:, None, :]

    # Direction interval straddling 0 -> slab times are unbounded on this
    # axis -> the axis constrains nothing (conservative).
    free = (d_lo <= 0.0) & (d_hi >= 0.0)
    i_lo = 1.0 / jnp.where(free, 1.0, d_hi)      # same-sign: 1/hi <= 1/lo
    i_hi = 1.0 / jnp.where(free, 1.0, d_lo)

    n1_lo, n1_hi = lo - o_hi, lo - o_lo          # box_lo - o
    n2_lo, n2_hi = hi - o_hi, hi - o_lo          # box_hi - o
    t1_lo, t1_hi = _interval_mul(n1_lo, n1_hi, i_lo, i_hi)
    t2_lo, t2_hi = _interval_mul(n2_lo, n2_hi, i_lo, i_hi)

    # Per-ray tnear_ax = min(t1, t2), tfar_ax = max(t1, t2); take the loose
    # end of each interval.
    tn = jnp.where(free, -_BIG, jnp.minimum(t1_lo, t2_lo))
    tf = jnp.where(free, _BIG, jnp.maximum(t1_hi, t2_hi))

    tnear = jnp.max(tn, axis=-1)                 # (P, L)
    tfar = jnp.min(tf, axis=-1)
    hit = (tfar >= tnear) & (tfar > EPSILON)
    if table.num_leaves >= 0:
        real = (jnp.arange(table.leaf_min.shape[0], dtype=jnp.int32)
                < table.num_leaves)
        hit = hit & real[None, :]
    return hit


def tile_candidates(origin: Array, direction: Array, table: LeafTable,
                    max_candidates: int):
    """Per-packet candidate prim-tile lists.

    origin/direction: (B, 3) with B a multiple of 1024 (pre-sorted rays).
    Returns (cand (P, K) i32, counts (P, 1) i32, overflow () bool).
    Candidate slots past ``counts[p]`` are set to ``num_tiles`` -- phase B
    appends one sentinel tile there and bounds its loop by counts, so they
    are never read. ``overflow`` means some packet had more surviving tiles
    than K and the result would be incomplete: the driver must retry with a
    larger K (nearest_hit_cull does this automatically).
    """
    T = table.num_tiles
    K = min(max_candidates, T)
    hit = packet_leaf_hit(*packet_bounds(origin, direction), table)  # (P, L)
    lpt = LANES // table.leaf_size
    tile_hit = hit.reshape(hit.shape[0], T, lpt).any(-1)             # (P, T)

    counts = tile_hit.sum(-1, dtype=jnp.int32)
    overflow = jnp.max(counts) > K

    # Survivors get distinct positive scores decreasing in tile id, so top_k
    # yields surviving tile ids in ascending (DFS ~ spatial) order.
    tid = jnp.arange(T, dtype=jnp.int32)
    score = jnp.where(tile_hit, T - tid, 0)
    vals, idx = jax.lax.top_k(score, K)
    cand = jnp.where(vals > 0, idx, T).astype(jnp.int32)
    return cand, counts[:, None], overflow
