"""Pallas TPU packet-traversal megakernel: the hot path of the framework.

TPU-native redesign of the reference's recursive per-ray BVH walk
(``ray_bvh_intersect``, src/hit.c:91-109). The design maps the branchy tree
walk onto the TPU's scalar-core + VPU split:

  * Rays are grouped into **packets of 8x128 = 1024** (one VPU register tile).
    Each grid program owns ``n_streams`` packets traversing concurrently.
  * A packet shares ONE traversal cursor, advanced on the scalar core
    (classic packet traversal): the packet descends into a subtree iff *any*
    ray's slab interval beats its current best t. Per-ray work is pure
    (8,128) VPU math -- no gathers, no per-lane control flow.
  * Node/prim geometry is VMEM-resident, packed as (blocks, 8, 128): element
    ``i`` lives at ``[i >> 7, component, i & 127]``; a node visit is one
    dynamic leading-index tile load plus a masked-sum lane extraction.
  * Per-node traversal META (escape index, next-if-hit, leaf start) lives in
    **SMEM** and is read with scalar-core loads. This keeps the whole
    control-flow chain (cursor select, leaf branch predicate) on the scalar
    core: the only vector->scalar synchronization per step is the single
    ``any(box_hit)`` reduction. An earlier all-VMEM variant paid 3 such
    round-trips per step (any + escape + leaf_start extracted from vector
    lanes) and ran ~40% slower.
  * Leaves are ``leaf_size`` consecutive prim slots (leaf_size | 128, so a
    leaf never crosses a lane tile); each is tested against all 1024 rays.

Differentiability: the kernel returns only the argmin **prim slot** per ray;
the wrapper maps slot -> sphere id and *recomputes* t from that id with plain
jnp ops, so gradients to sphere centers/radii flow through the recomputation
and no custom VJP is needed for closest-hit (the argmin index is piecewise
constant).

The grid is sequential on a TensorCore; packet tiles are pipelined
(HBM->VMEM) by Pallas while the tables stay resident. VMEM budget: 4 KB per
128 nodes + 4 KB per 128 prim slots (100k spheres at leaf_size=32 is ~3.5 MB
prims + 0.3 MB nodes); SMEM: 12 B/node.
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
PACKET = SUBLANES * LANES  # rays per packet

_HUGE = 3.0e38  # python literal: jnp scalars would be captured as consts


@flax.struct.dataclass
class PackedBVH:
    """Kernel-layout scene+BVH tables (see module docstring).

    nodes: (NB, 8, 128) f32 -- rows 0-5 box min/max, rows 6-7 zero pad
    esc:   (M,) i32 -- escape index (next cursor on miss / after a leaf)
    nxt:   (M,) i32 -- next cursor on hit: node+1 for internal, esc for leaf
    lstart:(M,) i32 -- first prim slot for leaves, -1 for internal nodes
    prims: (PB, 8, 128) f32 -- rows 0-2 center, 3 radius^2, 4-7 zero
    prim_idx: (P,) i32 -- prim slot -> sphere id (kernel returns slots;
           the wrapper gathers ids outside, so no int field rides in VMEM)
    num_nodes: static int (while-loop bound)
    leaf_size: static int
    """

    nodes: Array
    esc: Array
    nxt: Array
    lstart: Array
    prims: Array
    prim_idx: Array
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
    """Pack a FlatBVH + scene into the kernel's table layout (jnp ops;
    jit-compatible, run once per scene/BVH)."""
    f32 = jnp.float32
    zeros = jnp.zeros_like(bvh.node_min[:, 0])
    nodes = _to_blocks(jnp.stack([
        bvh.node_min[:, 0], bvh.node_min[:, 1], bvh.node_min[:, 2],
        bvh.node_max[:, 0], bvh.node_max[:, 1], bvh.node_max[:, 2],
        zeros, zeros,
    ]).astype(f32))

    is_leaf = bvh.leaf_start >= 0
    order = jnp.arange(bvh.num_nodes, dtype=jnp.int32)
    nxt = jnp.where(is_leaf, bvh.escape, order + 1)

    centers_p, radii_p = padded_scene_arrays(scene.centers, scene.radii)
    c = centers_p[bvh.prim_idx]          # (P, 3); sentinel slots -> far sphere
    r = radii_p[bvh.prim_idx]
    z = jnp.zeros_like(r)
    prims = _to_blocks(jnp.stack([
        c[:, 0], c[:, 1], c[:, 2], r * r, z, z, z, z,
    ]).astype(f32))

    return PackedBVH(nodes=nodes, esc=bvh.escape.astype(jnp.int32),
                     nxt=nxt.astype(jnp.int32),
                     lstart=bvh.leaf_start.astype(jnp.int32),
                     prims=prims, prim_idx=bvh.prim_idx,
                     num_nodes=bvh.num_nodes, leaf_size=bvh.leaf_size)


def _traverse_kernel(rays_ref, nodes_ref, esc_ref, nxt_ref, lstart_ref,
                     prims_ref, t_ref, idx_ref, steps_ref, *,
                     num_nodes: int, leaf_size: int, n_streams: int):
    """``n_streams`` independent packets traverse concurrently in one program,
    python-unrolled so Mosaic sees independent dependency chains per loop
    iteration (software pipelining across the per-step scalar sync)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)

    def extract_f(ref_tile, sel):
        """Lane ``sel`` of an (8,128) tile broadcast over all lanes (f32).

        Masked sum + lane-reduce + lane-broadcast: stays entirely in the
        vector domain. Vector->scalar element reads and (1,1)->(8,128)
        broadcasts both measured slower (Mosaic lowers them through
        scalar-core round trips / doesn't support them)."""
        m = lane == sel
        colf = jnp.sum(jnp.where(m, ref_tile, 0.0), axis=1, keepdims=True)
        return jnp.broadcast_to(colf, (SUBLANES, LANES))

    def row(C, k):
        return jnp.broadcast_to(C[k:k + 1, :], (SUBLANES, LANES))

    # Per-stream ray data (loaded once; lives in vregs/VMEM for the loop).
    S = n_streams
    ray = []
    for s in range(S):
        ox, oy, oz = rays_ref[s, 0], rays_ref[s, 1], rays_ref[s, 2]
        dx, dy, dz = rays_ref[s, 3], rays_ref[s, 4], rays_ref[s, 5]

        def inv(d):
            # Reference zero-direction convention (src/hit.c:53-57),
            # branch-free.
            return jnp.where(d == 0.0, _HUGE,
                             1.0 / jnp.where(d == 0.0, 1.0, d))

        a = dx * dx + dy * dy + dz * dz        # quadratic 'a' per ray
        ray.append(dict(o=(ox, oy, oz), d=(dx, dy, dz),
                        inv=(inv(dx), inv(dy), inv(dz)), a=a,
                        inv2a=1.0 / (2.0 * jnp.maximum(a, 1e-30))))

    def step_stream(s, cursor, t_best, idx_best, steps):
        active = cursor < num_nodes
        cur = jnp.minimum(cursor, num_nodes - 1)   # clamp for safe loads
        tile = nodes_ref[cur // LANES]
        Cf = extract_f(tile, cur % LANES)
        (ox, oy, oz), (dx, dy, dz) = ray[s]["o"], ray[s]["d"]
        invx, invy, invz = ray[s]["inv"]

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
        any_hit = jnp.any(box_hit) & active        # sole vector->scalar sync

        esc = esc_ref[cur]                          # scalar-core loads (SMEM)
        nxt = nxt_ref[cur]
        lstart = lstart_ref[cur]

        def leaf_fn(args):
            tb, ib = args
            # Leaves never straddle a 128-lane tile (leaf_size | 128).
            ptile = prims_ref[lstart // LANES]
            base = lstart % LANES
            for j in range(leaf_size):
                Pf = extract_f(ptile, base + j)
                ocx = ox - row(Pf, 0)
                ocy = oy - row(Pf, 1)
                ocz = oz - row(Pf, 2)
                rsq = row(Pf, 3)
                bq = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
                cq = ocx * ocx + ocy * ocy + ocz * ocz - rsq
                disc = bq * bq - 4.0 * ray[s]["a"] * cq
                t = (-bq - jnp.sqrt(jnp.maximum(disc, 0.0))) * ray[s]["inv2a"]
                ok = (disc > 0.0) & (t > EPSILON) & (t < tb)
                tb = jnp.where(ok, t, tb)
                # prim SLOT (scalar broadcast); slot -> sphere id happens in
                # the wrapper via prim_idx, so no int field rides in VMEM.
                ib = jnp.where(ok, lstart + j, ib)
            return tb, ib

        t_best, idx_best = jax.lax.cond(
            any_hit & (lstart >= 0), leaf_fn, lambda args: args,
            (t_best, idx_best))

        cursor = jnp.where(active, jnp.where(any_hit, nxt, esc), num_nodes)
        return cursor, t_best, idx_best, steps + active.astype(jnp.int32)

    def cond(c):
        alive = c[0][0] < num_nodes
        for s in range(1, S):
            alive |= c[0][s] < num_nodes
        return alive

    def body(c):
        cursors, t_bests, idx_bests, steps = c
        out = [step_stream(s, cursors[s], t_bests[s], idx_bests[s], steps[s])
               for s in range(S)]
        return (tuple(o[0] for o in out), tuple(o[1] for o in out),
                tuple(o[2] for o in out), tuple(o[3] for o in out))

    init = (tuple(jnp.int32(0) for _ in range(S)),
            tuple(jnp.full((SUBLANES, LANES), jnp.inf, jnp.float32)
                  for _ in range(S)),
            tuple(jnp.full((SUBLANES, LANES), -1, jnp.int32)
                  for _ in range(S)),
            tuple(jnp.int32(0) for _ in range(S)))
    _, t_bests, idx_bests, steps = jax.lax.while_loop(cond, body, init)

    for s in range(S):
        t_ref[s] = t_bests[s]
        idx_ref[s] = idx_bests[s]
        steps_ref[s] = jnp.full((SUBLANES, LANES), steps[s], jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret", "n_streams"))
def _traverse_packets(rays_packed: Array, packed: PackedBVH,
                      interpret: bool = False, n_streams: int = 1):
    g = rays_packed.shape[0]
    assert g % n_streams == 0, (g, n_streams)
    kernel = functools.partial(
        _traverse_kernel,
        num_nodes=packed.num_nodes, leaf_size=packed.leaf_size,
        n_streams=n_streams)
    S = n_streams
    return pl.pallas_call(
        kernel,
        grid=(g // S,),
        in_specs=[
            pl.BlockSpec((S, 6, SUBLANES, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((S, SUBLANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, SUBLANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, SUBLANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((g, SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((g, SUBLANES, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(rays_packed, packed.nodes, packed.esc, packed.nxt, packed.lstart,
      packed.prims)


def nearest_hit_bvh_pallas(rays: Ray, scene: Scene, packed: PackedBVH,
                           interpret: bool = False,
                           with_steps: bool = False,
                           n_streams: int = 1):
    """Closest hit via the packet kernel; batch shape preserved.

    Returns a HitRecord (and, with ``with_steps``, the per-packet visited-node
    count -- the analog of the reference's ``intersection_tests`` counter,
    src/benchmark.c:195-196).
    """
    batch_shape = rays.batch_shape
    o = rays.origin.reshape(-1, 3)
    d = rays.direction.reshape(-1, 3)
    b = o.shape[0]
    g = n_streams * (-(-b // (PACKET * n_streams)))
    pad = g * PACKET - b

    def pack_rays(x):
        # Edge-replicate padding: dummy rays are copies of the last real ray,
        # so a partially-dummy program stays coherent instead of walking the
        # whole tree.
        x = jnp.pad(x, ((0, pad), (0, 0)), mode="edge")
        # ray (g*1024 + s*128 + l) -> [g, comp, s, l]
        return x.reshape(g, SUBLANES, LANES, 3).transpose(0, 3, 1, 2)

    rays_packed = jnp.concatenate([pack_rays(o), pack_rays(d)], axis=1)
    _, idx, steps = _traverse_packets(rays_packed, packed,
                                      interpret=interpret,
                                      n_streams=n_streams)

    def unpack(x):
        return x.reshape(g * PACKET)[:b]

    slot = unpack(idx)
    steps = unpack(steps)

    # Kernel reports the winning prim SLOT; map to sphere id (slot -1 = miss).
    idx = jnp.where(slot >= 0, packed.prim_idx[jnp.maximum(slot, 0)], -1)

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
