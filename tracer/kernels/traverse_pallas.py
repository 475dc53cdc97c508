"""Pallas TPU packet-traversal megakernel: the hot path of the framework.

TPU-native redesign of the reference's recursive per-ray BVH walk
(``ray_bvh_intersect``, src/hit.c:91-109). The design maps the branchy tree
walk onto the TPU's scalar-core + VPU split:

  * Rays are grouped into **packets of 8x128 = 1024** (one VPU register tile).
    Each grid program owns one packet.
  * The whole packet shares ONE traversal cursor, advanced on the scalar core
    (classic packet traversal): the packet descends into a subtree iff *any*
    ray's slab interval beats its current best t. Per-ray work is pure
    (8,128) VPU math -- no gathers, no per-lane control flow.
  * Node and primitive tables are VMEM-resident, packed as (blocks, 8, 128):
    element ``i`` lives at ``[i >> 7, component, i & 127]``, so a node visit
    is one dynamic leading-index tile load plus a masked-sum lane extraction.
    Integer fields (escape, leaf_start, sphere id) ride as int32 bit patterns
    bitcast into the float tile and are extracted with *integer* masked sums
    -- a float dot/add would flush small-int bit patterns (denormals) to zero.
  * Leaves are ``leaf_size`` consecutive prim slots (leaf_size | 128, so a
    leaf never crosses a lane tile); each is tested against all 1024 rays.

Differentiability: the kernel returns only the argmin **sphere index** per
ray; the wrapper *recomputes* t from that index with plain jnp ops, so
gradients to sphere centers/radii flow through the recomputation and no
custom VJP is needed for closest-hit (the argmin index is piecewise constant).

The grid is sequential on a TensorCore; packet tiles are pipelined (HBM->VMEM)
by Pallas while the tables stay resident. VMEM budget: nodes 512 B/128-block
... i.e. 4 KB per 128 nodes + 4 KB per 128 prim slots; 100k spheres with
leaf_size=4 fits comfortably (~3.4 MB total).
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.bvh.flat import FlatBVH, padded_scene_arrays
from tracer.core.types import Ray, HitRecord
from tracer.intersect.sphere import ray_sphere_t, hit_record_from_t, EPSILON
from tracer.scene.scene import Scene

LANES = 128
SUBLANES = 8
PACKET = SUBLANES * LANES  # rays per packet / grid program

_HUGE = 3.0e38  # python literal: jnp scalars would be captured as consts


@flax.struct.dataclass
class PackedBVH:
    """Kernel-layout scene+BVH tables (see module docstring).

    nodes: (NB, 8, 128) f32 -- rows 0-5 box min/max, row 6 escape (i32 bits),
           row 7 leaf_start (i32 bits, -1 for internal nodes)
    prims: (PB, 8, 128) f32 -- rows 0-2 center, 3 radius, 4 sphere id
           (i32 bits), 5-7 zero
    num_nodes: static int (while-loop bound)
    leaf_size: static int
    """

    nodes: Array
    prims: Array
    num_nodes: int = flax.struct.field(pytree_node=False)
    leaf_size: int = flax.struct.field(pytree_node=False)


def _to_blocks(components: Array) -> Array:
    """(8, K) component-major -> (ceil(K/128), 8, 128) block layout."""
    k = components.shape[1]
    kb = -(-k // LANES)
    pad = kb * LANES - k
    components = jnp.pad(components, ((0, 0), (0, pad)))
    return components.reshape(SUBLANES, kb, LANES).transpose(1, 0, 2)


def pack_bvh(scene: Scene, bvh: FlatBVH) -> PackedBVH:
    """Pack a FlatBVH + scene into the kernel's VMEM table layout (jnp ops;
    jit-compatible, run once per scene/BVH)."""
    f32 = jnp.float32
    bits = lambda x: jax.lax.bitcast_convert_type(x.astype(jnp.int32), f32)

    nodes = _to_blocks(jnp.stack([
        bvh.node_min[:, 0], bvh.node_min[:, 1], bvh.node_min[:, 2],
        bvh.node_max[:, 0], bvh.node_max[:, 1], bvh.node_max[:, 2],
        bits(bvh.escape), bits(bvh.leaf_start),
    ]).astype(f32))

    centers_p, radii_p = padded_scene_arrays(scene.centers, scene.radii)
    c = centers_p[bvh.prim_idx]          # (P, 3); sentinel slots -> far sphere
    r = radii_p[bvh.prim_idx]
    prims = _to_blocks(jnp.stack([
        c[:, 0], c[:, 1], c[:, 2], r,
        bits(bvh.prim_idx), jnp.zeros_like(r), jnp.zeros_like(r),
        jnp.zeros_like(r),
    ]).astype(f32))

    return PackedBVH(nodes=nodes, prims=prims,
                     num_nodes=bvh.num_nodes, leaf_size=bvh.leaf_size)


def _traverse_kernel(rays_ref, nodes_ref, prims_ref, t_ref, idx_ref,
                     steps_ref, *, num_nodes: int, leaf_size: int):
    ox, oy, oz = rays_ref[0, 0], rays_ref[0, 1], rays_ref[0, 2]
    dx, dy, dz = rays_ref[0, 3], rays_ref[0, 4], rays_ref[0, 5]

    def inv(d):
        # Reference zero-direction convention (src/hit.c:53-57) branch-free.
        return jnp.where(d == 0.0, _HUGE, 1.0 / jnp.where(d == 0.0, 1.0, d))

    invx, invy, invz = inv(dx), inv(dy), inv(dz)
    a = dx * dx + dy * dy + dz * dz            # quadratic 'a' per ray
    inv2a = 1.0 / (2.0 * jnp.maximum(a, 1e-30))

    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)

    def extract(ref_tile, sel):
        """Lane ``sel`` of an (8,128) tile, broadcast back over all lanes:
        float (8,128) and int32 (8,128) views. The masked sums are exact
        (integer adds for the bit-pattern fields -- a float dot would flush
        small-int bit patterns as denormals). Staying in the vector domain
        avoids vector->scalar->vector round trips per field; component k is
        then a sublane-slice broadcast (``row``below). Both broadcasts are
        single-axis (lane-only / sublane-only), which Mosaic supports."""
        m = lane == sel
        colf = jnp.sum(jnp.where(m, ref_tile, 0.0), axis=1, keepdims=True)
        coli = jnp.sum(jnp.where(m, pltpu.bitcast(ref_tile, jnp.int32), 0),
                       axis=1, keepdims=True)
        return (jnp.broadcast_to(colf, (SUBLANES, LANES)),
                jnp.broadcast_to(coli, (SUBLANES, LANES)))

    def row(C, k):
        return jnp.broadcast_to(C[k:k + 1, :], (SUBLANES, LANES))

    def cond(c):
        return c[0] < num_nodes

    def body(c):
        cursor, t_best, idx_best, steps = c
        tile = nodes_ref[cursor // LANES]
        Cf, Ci = extract(tile, cursor % LANES)

        t1x = (row(Cf, 0) - ox) * invx
        t2x = (row(Cf, 3) - ox) * invx
        t1y = (row(Cf, 1) - oy) * invy
        t2y = (row(Cf, 4) - oy) * invy
        t1z = (row(Cf, 2) - oz) * invz
        t2z = (row(Cf, 5) - oz) * invz
        tmin = jnp.maximum(jnp.minimum(t1x, t2x),
                           jnp.maximum(jnp.minimum(t1y, t2y),
                                       jnp.minimum(t1z, t2z)))
        tmax = jnp.minimum(jnp.maximum(t1x, t2x),
                           jnp.minimum(jnp.maximum(t1y, t2y),
                                       jnp.maximum(t1z, t2z)))
        # Reference acceptance (src/hit.c:81) + per-ray best-t pruning.
        box_hit = (tmax >= tmin) & (tmax > EPSILON) & (tmin < t_best)
        any_hit = jnp.any(box_hit)

        esc = Ci[6, 0]
        lstart = Ci[7, 0]
        is_leaf = lstart >= 0

        def leaf_fn(args):
            tb, ib = args
            ptile = prims_ref[lstart // LANES]
            base = lstart % LANES
            for j in range(leaf_size):
                Pf, Pi = extract(ptile, base + j)
                ocx = ox - row(Pf, 0)
                ocy = oy - row(Pf, 1)
                ocz = oz - row(Pf, 2)
                r = row(Pf, 3)
                bq = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
                cq = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                disc = bq * bq - 4.0 * a * cq
                t = (-bq - jnp.sqrt(jnp.maximum(disc, 0.0))) * inv2a
                ok = (disc > 0.0) & (t > EPSILON) & (t < tb)
                tb = jnp.where(ok, t, tb)
                ib = jnp.where(ok, row(Pi, 4), ib)
            return tb, ib

        t_best, idx_best = jax.lax.cond(
            any_hit & is_leaf, leaf_fn, lambda args: args, (t_best, idx_best))

        descend = any_hit & jnp.logical_not(is_leaf)
        cursor = jnp.where(descend, cursor + 1, esc)
        return cursor, t_best, idx_best, steps + 1

    init = (jnp.int32(0),
            jnp.full((SUBLANES, LANES), jnp.inf, jnp.float32),
            jnp.full((SUBLANES, LANES), -1, jnp.int32),
            jnp.int32(0))
    _, t_best, idx_best, steps = jax.lax.while_loop(cond, body, init)

    t_ref[0] = t_best
    idx_ref[0] = idx_best
    steps_ref[0] = jnp.full((SUBLANES, LANES), steps, jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _traverse_packets(rays_packed: Array, packed: PackedBVH,
                      interpret: bool = False):
    g = rays_packed.shape[0]
    kernel = functools.partial(
        _traverse_kernel,
        num_nodes=packed.num_nodes, leaf_size=packed.leaf_size)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 6, SUBLANES, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((g, SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((g, SUBLANES, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(rays_packed, packed.nodes, packed.prims)


def nearest_hit_bvh_pallas(rays: Ray, scene: Scene, packed: PackedBVH,
                           interpret: bool = False,
                           with_steps: bool = False):
    """Closest hit via the packet kernel; batch shape preserved.

    Returns a HitRecord (and, with ``with_steps``, the per-ray visited-node
    count -- the analog of the reference's ``intersection_tests`` counter,
    src/benchmark.c:195-196).
    """
    batch_shape = rays.batch_shape
    o = rays.origin.reshape(-1, 3)
    d = rays.direction.reshape(-1, 3)
    b = o.shape[0]
    g = -(-b // PACKET)
    pad = g * PACKET - b

    def pack_rays(x):
        x = jnp.pad(x, ((0, pad), (0, 0)))
        # ray (g*1024 + s*128 + l) -> [g, comp, s, l]
        return x.reshape(g, SUBLANES, LANES, 3).transpose(0, 3, 1, 2)

    rays_packed = jnp.concatenate([pack_rays(o), pack_rays(d)], axis=1)
    _, idx, steps = _traverse_packets(rays_packed, packed, interpret=interpret)

    def unpack(x):
        return x.reshape(g * PACKET)[:b]

    idx = unpack(idx)
    steps = unpack(steps)

    # Differentiable recomputation of t from the (piecewise-constant) argmin
    # index: gradients to centers/radii flow here, outside the kernel.
    safe = jnp.maximum(idx, 0)
    t = ray_sphere_t(o, d, scene.centers[safe], scene.radii[safe])
    t = jnp.where(idx >= 0, t, jnp.inf)
    rec = hit_record_from_t(Ray(origin=o, direction=d), t, idx, scene.centers)
    rec = jax.tree_util.tree_map(
        lambda x: x.reshape(*batch_shape, *x.shape[1:]), rec)
    if with_steps:
        return rec, steps.reshape(batch_shape)
    return rec
