"""Pallas TPU cull-path intersector (phase B): dense packet x tile tests.

Companion to tracer/intersect/cull.py (phase A). Phase A hands every
1024-ray packet a short list of candidate 128-primitive tiles (prim slots of
the SAH BVH's leaves, conservatively culled). This kernel intersects the
packet against exactly those tiles with a *fixed-structure* loop:

    for k in [0, count):                  # scalar trip count from SMEM
        tile = prims[cand[k]]             # dynamic leading-index VMEM load
        for j in 0..127:                  # static unroll
            test prim j against all 1024 rays (VPU, (8,128) tiles)

Unlike the packet-traversal kernel (traverse_pallas.py), there is **no
vector->scalar synchronization anywhere**: the loop bounds and tile indices
are scalar-core data prepared by phase A, so the VPU never stalls waiting
for its own comparison results to route the control flow. This is the
TPU-native answer to the reference's branchy per-ray DFS
(``ray_bvh_intersect``, src/hit.c:91-109): the tree decides *what* to test
up front (dense, vectorized, phase A); the kernel only *tests* (dense VPU).

Sphere-test semantics are the reference's exactly (near root only, disc > 0,
t > EPSILON; src/hit.c:19-39) so results match brute force bit-for-bit.

Like the traversal kernel, only the argmin prim SLOT leaves the kernel; the
wrapper recomputes t differentiably from the winning sphere id.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.bvh.flat import FlatBVH
from tracer.core.types import Ray, HitRecord
from tracer.intersect.cull import LeafTable, build_leaf_table, tile_candidates
from tracer.intersect.sphere import ray_sphere_t, hit_record_from_t, EPSILON
from tracer.kernels.traverse_pallas import (
    LANES, SUBLANES, PACKET, PackedBVH, pack_bvh)
from tracer.scene.scene import Scene

_HUGE = 3.0e38


def append_sentinel_tile(prims: Array) -> Array:
    """One trailing never-hit tile (cand slots past ``count`` point here)."""
    s = jnp.zeros((1, SUBLANES, LANES), prims.dtype)
    s = s.at[0, 0:3].set(1.0e18)     # center far away
    s = s.at[0, 3].set(-1.0)         # r^2 < 0 -> discriminant < 0 always
    return jnp.concatenate([prims, s], axis=0)


def _cull_kernel(count_ref, cand_ref, rays_ref, prims_ref, t_ref, idx_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    p = pl.program_id(0)

    def extract(tile, j):
        """Column j of an (8,128) tile, broadcast to all lanes (static j)."""
        m = lane == j
        col = jnp.sum(jnp.where(m, tile, 0.0), axis=1, keepdims=True)
        return jnp.broadcast_to(col, (SUBLANES, LANES))

    def row(C, r):
        return jnp.broadcast_to(C[r:r + 1, :], (SUBLANES, LANES))

    ox, oy, oz = rays_ref[0, 0], rays_ref[0, 1], rays_ref[0, 2]
    dx, dy, dz = rays_ref[0, 3], rays_ref[0, 4], rays_ref[0, 5]
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / jnp.maximum(a, 1e-30)

    nc = count_ref[p]

    def tile_body(k, carry):
        tb, ib = carry
        tile_id = cand_ref[p, k]
        ptile = prims_ref[tile_id]
        base = tile_id * LANES
        for j in range(LANES):
            P = extract(ptile, j)
            ocx = ox - row(P, 0)
            ocy = oy - row(P, 1)
            ocz = oz - row(P, 2)
            rsq = row(P, 3)
            hb = ocx * dx + ocy * dy + ocz * dz          # b / 2
            cq = ocx * ocx + ocy * ocy + ocz * ocz - rsq
            disc4 = hb * hb - a * cq                     # disc / 4
            t = (-hb - jnp.sqrt(jnp.maximum(disc4, 0.0))) * inv_a
            ok = (disc4 > 0.0) & (t > EPSILON) & (t < tb)
            tb = jnp.where(ok, t, tb)
            ib = jnp.where(ok, base + j, ib)
        return tb, ib

    init = (jnp.full((SUBLANES, LANES), jnp.inf, jnp.float32),
            jnp.full((SUBLANES, LANES), -1, jnp.int32))
    tb, ib = jax.lax.fori_loop(0, nc, tile_body, init)
    t_ref[0] = tb
    idx_ref[0] = ib


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cull_packets(rays_packed: Array, prims: Array, cand: Array,
                  counts: Array, interpret: bool = False):
    g = rays_packed.shape[0]
    # counts/cand ride as scalar-prefetch args (whole arrays in SMEM, indexed
    # by program_id): per-block SMEM BlockSpecs with (1, K) shapes violate the
    # TPU (8, 128) block-divisibility rule and fail to lower on hardware.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 6, SUBLANES, LANES), lambda i, c0, c1: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, SUBLANES, LANES), lambda i, c0, c1: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, LANES), lambda i, c0, c1: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        _cull_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((g, SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((g, SUBLANES, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(counts.reshape(g), cand, rays_packed, prims)


def pack_rays(o: Array, d: Array):
    """Flat (B,3) rays -> (G, 6, 8, 128) packet layout (edge-replicated pad).

    Ray ``g*1024 + s*128 + l`` lands at ``[g, comp, s, l]``.
    """
    b = o.shape[0]
    g = -(-b // PACKET)
    pad = g * PACKET - b

    def pk(x):
        x = jnp.pad(x, ((0, pad), (0, 0)), mode="edge")
        return x.reshape(g, SUBLANES, LANES, 3).transpose(0, 3, 1, 2)

    return jnp.concatenate([pk(o), pk(d)], axis=1), g, pad


@functools.partial(jax.jit, static_argnames=("max_candidates", "interpret"))
def nearest_hit_cull(rays: Ray, scene: Scene, packed: PackedBVH,
                     table: LeafTable, max_candidates: int = 128,
                     interpret: bool = False):
    """Closest hit via cull (phase A) + dense tiles (phase B).

    Rays should be pre-sorted for coherence (tracer/core/sort.py). Returns
    ``(HitRecord, overflow)``: when ``overflow`` is True some packet had more
    surviving tiles than ``max_candidates`` and hits may be missed --
    re-dispatch with a larger budget (see ``nearest_hit_cull_checked``).
    """
    batch_shape = rays.batch_shape
    o = rays.origin.reshape(-1, 3)
    d = rays.direction.reshape(-1, 3)
    b = o.shape[0]

    rays_packed, g, pad = pack_rays(o, d)
    op = jnp.pad(o, ((0, pad), (0, 0)), mode="edge")
    dp = jnp.pad(d, ((0, pad), (0, 0)), mode="edge")
    cand, counts, overflow = tile_candidates(op, dp, table, max_candidates)

    prims = append_sentinel_tile(packed.prims)
    _, idx = _cull_packets(rays_packed, prims, cand, counts,
                           interpret=interpret)

    slot = idx.reshape(g * PACKET)[:b]
    sphere_id = jnp.where(slot >= 0, packed.prim_idx[jnp.maximum(slot, 0)], -1)

    # Differentiable recomputation of t from the argmin index (piecewise
    # constant), same as the traversal wrapper.
    safe = jnp.maximum(sphere_id, 0)
    t = ray_sphere_t(o, d, scene.centers[safe], scene.radii[safe])
    t = jnp.where(sphere_id >= 0, t, jnp.inf)
    rec = hit_record_from_t(Ray(origin=o, direction=d), t, sphere_id,
                            scene.centers)
    rec = jax.tree_util.tree_map(
        lambda x: x.reshape(*batch_shape, *x.shape[1:]), rec)
    return rec, overflow


def nearest_hit_cull_checked(rays: Ray, scene: Scene, packed: PackedBVH,
                             table: LeafTable, max_candidates: int = 128,
                             interpret: bool = False) -> HitRecord:
    """Escalating driver: doubles the candidate budget until no packet
    overflows (each budget is a separate compiled specialization)."""
    k = max_candidates
    while True:
        rec, overflow = nearest_hit_cull(rays, scene, packed, table,
                                         max_candidates=k,
                                         interpret=interpret)
        if not bool(overflow) or k >= table.num_tiles:
            return rec
        k = min(2 * k, table.num_tiles)
