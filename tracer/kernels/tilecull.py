"""MXU tile-cull intersector: the round-2 hot path.

Third-generation TPU design for the reference's closest-hit query
(``ray_bvh_intersect``, src/hit.c:91-109), superseding the packet-traversal
kernel (traverse_pallas.py) for throughput workloads. Two prior designs both
lose to TPU hardware realities:

  * per-packet tree walking serializes on a vector->scalar sync per visited
    node (~350 ns each), and a 1024-ray packet pays the *union* of its rays'
    subtrees;
  * the 1024-ray cull kernel (cull_pallas.py) removes the syncs but tests
    every candidate against 8x more rays than share the frustum.

This kernel shrinks the frustum to **128-ray subpackets** and computes the
(128 rays x 128 prims) sphere tests as dense **outer-product broadcasts** on
the VPU:

    for the quadratic  t = (-b' - sqrt(b'^2 - a c)) / a,  b' = oc.d:
        c.d           = dx*cx + dy*cy + dz*cz       ray (128,1) columns x
        -2 o.c + ccr  = -2(ox*cx + oy*cy + oz*cz)+ccr   prim (1,128) rows
        b' = (o.d) - [c.d];   c = (|o|^2) + [-2 o.c + ccr]

~27 f32 VPU ops per pair, zero scalar synchronization, zero gathers inside
the test. (An MXU dot_general formulation was tried and rejected: per-tile
(128,8)@(8,128) dots are MXU-latency-bound, and the TPU's default bf16 dot
precision corrupts the disc = b'^2 - a*c cancellation -- false hits on real
hardware that the interpreter never shows.) Candidate tiles come precomputed
from phase A (tracer/intersect/cull.py, conservative frustum culling of the
SAH BVH's leaf boxes), so the tree still decides *what* to test -- the
reference's O(log n) scaling -- while the kernel only *tests*.

Number semantics: identical acceptance rule to the reference (disc > 0, near
root only, t > EPSILON; src/hit.c:19-39), evaluated in the same f32 ops
modulo fusion order; the wrapper recomputes the reported t from the winning
sphere id with the exact brute formulation, so any deviation from brute
force is confined to measure-zero graze/tie flips (tests assert this).

Candidate lists ride in SMEM as count-embedded rows ``[count, id0, id1, ...]``
padded to a 128 multiple (per-block SMEM windows must obey the (8,128) tile
rule; a separate (G, S) counts array cannot).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.core.types import Ray, HitRecord
from tracer.intersect.cull import LeafTable, packet_leaf_hit
from tracer.intersect.sphere import ray_sphere_t, hit_record_from_t, EPSILON
from tracer.kernels.traverse_pallas import LANES, SUBLANES, PackedBVH
from tracer.scene.scene import Scene

SUBPACKET = 128          # rays per frustum/candidate-list unit
_BIG = 3.0e38
_NOSLOT = 2 ** 30


def pack_prim_tiles(packed: PackedBVH) -> Array:
    """(T+1, 8, 128) MXU operand tiles from the PackedBVH prim table.

    Rows 0-2: center xyz (slot order); row 3: |c|^2 - r^2; rows 4-7: zero.
    The trailing sentinel tile (c=0, row3=1e30) can never hit: its
    discriminant is (o.d)^2 - a(|o|^2 + 1e30) < 0 by Cauchy-Schwarz with a
    ~1e30 margin, safe against fp32 rounding.
    """
    p = packed.prims                     # (T, 8, 128): rows 0-2 c, 3 r^2
    ccr = p[:, 0] ** 2 + p[:, 1] ** 2 + p[:, 2] ** 2 - p[:, 3]
    tiles = p.at[:, 3].set(ccr)
    sent = jnp.zeros((1, SUBLANES, LANES), p.dtype).at[0, 3].set(1.0e30)
    return jnp.concatenate([tiles, sent], axis=0)


def pack_ray_features(o: Array, d: Array, subpackets: int):
    """(B, 3) rays -> (G, S, 3, 128, 8) MXU/broadcast operands.

    [g, s, 0] = A1: rows of [dx, dy, dz, 0, ...]     (c.d matmul operand)
    [g, s, 1] = A2: rows of [-2ox, -2oy, -2oz, 1, 0...]  (-2 o.c + ccr operand)
    [g, s, 2] = per-ray scalar columns [o.d, |o|^2, a, 1/a, 0...]

    Padding rays replicate the last real ray (coherent tail).
    Returns (features, G, pad).
    """
    S = subpackets
    b = o.shape[0]
    step = S * SUBPACKET
    g = -(-b // step)
    pad = g * step - b
    o = jnp.pad(o, ((0, pad), (0, 0)), mode="edge")
    d = jnp.pad(d, ((0, pad), (0, 0)), mode="edge")

    zeros = jnp.zeros_like(o[:, 0])
    ones = jnp.ones_like(zeros)
    a1 = jnp.stack([d[:, 0], d[:, 1], d[:, 2], zeros,
                    zeros, zeros, zeros, zeros], axis=-1)
    a2 = jnp.stack([-2.0 * o[:, 0], -2.0 * o[:, 1], -2.0 * o[:, 2], ones,
                    zeros, zeros, zeros, zeros], axis=-1)
    od = jnp.sum(o * d, axis=-1)
    oo = jnp.sum(o * o, axis=-1)
    a = jnp.sum(d * d, axis=-1)
    inva = 1.0 / jnp.maximum(a, 1e-30)
    sc = jnp.stack([od, oo, a, inva, zeros, zeros, zeros, zeros], axis=-1)

    feats = jnp.stack([a1, a2, sc], axis=1)          # (B', 3, 8)
    feats = feats.reshape(g, S, SUBPACKET, 3, 8).transpose(0, 1, 3, 2, 4)
    return feats.astype(jnp.float32), g, pad


def subpacket_candidates(o: Array, d: Array, table: LeafTable,
                         max_candidates: int, subpackets: int):
    """Phase A at 128-ray granularity, count-embedded for the kernel.

    o/d are the padded (G*S*128, 3) ray arrays. Returns
    (cand (G, S, Kp) i32 with [g,s,0] = count and ids from slot 1,
     overflow () bool). Unused id slots point at the sentinel tile T.
    """
    T = table.num_tiles
    K = max_candidates
    op = o.reshape(-1, SUBPACKET, 3)
    dp = d.reshape(-1, SUBPACKET, 3)
    hit = packet_leaf_hit(op.min(1), op.max(1), dp.min(1), dp.max(1), table)
    lpt = LANES // table.leaf_size
    tile_hit = hit.reshape(hit.shape[0], T, lpt).any(-1)      # (P, T)

    counts = tile_hit.sum(-1, dtype=jnp.int32)
    overflow = jnp.max(counts) > K

    # Stream-compact surviving tile ids into the first count slots, ascending
    # (cumsum positions + scatter-min). O(P*T), far cheaper than the top_k
    # sort it replaces; survivors past the budget land in the K trash slot.
    pos = jnp.cumsum(tile_hit, axis=-1, dtype=jnp.int32)   # 1-based ranks
    slot = jnp.minimum(jnp.where(tile_hit, pos - 1, K), K)
    tid = jnp.arange(T, dtype=jnp.int32)
    cand = jnp.full((tile_hit.shape[0], K + 1), T, jnp.int32)
    cand = cand.at[jnp.arange(tile_hit.shape[0])[:, None], slot].min(
        jnp.broadcast_to(tid, tile_hit.shape))[:, :K]

    row = jnp.concatenate([jnp.minimum(counts, K)[:, None], cand], axis=1)
    kp = -(-(K + 1) // LANES) * LANES
    row = jnp.pad(row, ((0, 0), (0, kp - K - 1)), constant_values=T)
    return row.reshape(-1, subpackets, kp), overflow


def _tilecull_kernel(cand_ref, rays_ref, prims_ref, t_ref, slot_ref, *,
                     subpackets: int):
    """One grid step = ``subpackets`` 128-ray frustums, each walking its own
    candidate-tile list with a scalar fori_loop (no vector->scalar syncs)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBPACKET, LANES), 1)

    t_cols = []
    slot_cols = []
    for s in range(subpackets):
        a1 = rays_ref[0, s, 0]          # (128, 8)
        a2 = rays_ref[0, s, 1]
        sc = rays_ref[0, s, 2]
        od = sc[:, 0:1]                 # (128, 1) per-ray columns
        oo = sc[:, 1:2]
        av = sc[:, 2:3]
        inva = sc[:, 3:4]
        nc = cand_ref[0, s, 0]

        dx, dy, dz = a1[:, 0:1], a1[:, 1:2], a1[:, 2:3]      # (128, 1) cols
        nox2, noy2, noz2 = a2[:, 0:1], a2[:, 1:2], a2[:, 2:3]  # -2 * origin

        def body(k, carry, dx=dx, dy=dy, dz=dz, nox2=nox2, noy2=noy2,
                 noz2=noz2, od=od, oo=oo, av=av, inva=inva, s=s):
            tb, ib = carry
            tid = cand_ref[0, s, k + 1]
            btile = prims_ref[tid]                       # (8, 128)
            cx, cy, cz = btile[0:1, :], btile[1:2, :], btile[2:3, :]  # rows
            ccr = btile[3:4, :]                          # |c|^2 - r^2
            # (ray column) x (prim row) outer-product broadcasts: pure f32
            # VPU, no MXU. An MXU dot_general formulation measured *slower*
            # here (the per-tile (128,8)@(8,128) is latency-bound) and the
            # TPU's default bf16 dot precision corrupts the disc = bp^2-a*cq
            # cancellation outright (false hits on hardware).
            m1 = dx * cx + dy * cy + dz * cz             # c.d      (128, 128)
            m2 = nox2 * cx + noy2 * cy + noz2 * cz + ccr  # -2o.c + ccr
            bp = od - m1                                 # oc.d
            cq = m2 + oo                                 # |oc|^2 - r^2
            disc = bp * bp - av * cq                     # disc / 4
            t = (-bp - jnp.sqrt(jnp.maximum(disc, 0.0))) * inva
            ok = (disc > 0.0) & (t > EPSILON) & (t < tb)
            tb = jnp.where(ok, t, tb)
            ib = jnp.where(ok, tid * LANES + lane, ib)
            return tb, ib

        init = (jnp.full((SUBPACKET, LANES), _BIG, jnp.float32),
                jnp.full((SUBPACKET, LANES), -1, jnp.int32))
        tb, ib = jax.lax.fori_loop(0, nc, body, init)

        tmin = jnp.min(tb, axis=1, keepdims=True)        # (128, 1)
        win = (tb == tmin) & (ib >= 0)
        slot = jnp.min(jnp.where(win, ib, _NOSLOT), axis=1, keepdims=True)
        t_cols.append(tmin)
        slot_cols.append(slot)

    t_ref[0] = jnp.concatenate(t_cols, axis=1)           # (128, S)
    slot_ref[0] = jnp.concatenate(slot_cols, axis=1)


@functools.partial(jax.jit, static_argnames=("subpackets", "interpret"))
def _tilecull_call(feats: Array, cand: Array, prims: Array,
                   subpackets: int, interpret: bool = False):
    g = feats.shape[0]
    S = subpackets
    kernel = functools.partial(_tilecull_kernel, subpackets=S)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, S, cand.shape[2]), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, 3, SUBPACKET, 8), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, SUBPACKET, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBPACKET, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, SUBPACKET, S), jnp.float32),
            jax.ShapeDtypeStruct((g, SUBPACKET, S), jnp.int32),
        ),
        interpret=interpret,
    )(cand, feats, prims)


@functools.partial(jax.jit,
                   static_argnames=("max_candidates", "subpackets",
                                    "interpret"))
def nearest_hit_tilecull(rays: Ray, scene: Scene, packed: PackedBVH,
                         table: LeafTable, max_candidates: int = 64,
                         subpackets: int = 8, interpret: bool = False):
    """Closest hit via 128-ray frustum cull + MXU tile tests.

    Rays should be pre-sorted for coherence (tracer/core/sort.py). Returns
    ``(HitRecord, overflow)``; on overflow re-dispatch with a larger budget
    (``nearest_hit_tilecull_checked`` automates this).
    """
    batch_shape = rays.batch_shape
    o = rays.origin.reshape(-1, 3)
    d = rays.direction.reshape(-1, 3)
    b = o.shape[0]

    feats, g, pad = pack_ray_features(o, d, subpackets)
    op = jnp.pad(o, ((0, pad), (0, 0)), mode="edge")
    dp = jnp.pad(d, ((0, pad), (0, 0)), mode="edge")
    cand, overflow = subpacket_candidates(op, dp, table, max_candidates,
                                          subpackets)
    prims = pack_prim_tiles(packed)

    t_k, slot = _tilecull_call(feats, cand, prims, subpackets,
                               interpret=interpret)
    # (G, 128, S): ray g*S*128 + s*128 + r sits at [g, r, s].
    slot = slot.transpose(0, 2, 1).reshape(-1)[:b]

    hit = slot < _NOSLOT
    sphere_id = jnp.where(hit, packed.prim_idx[jnp.where(hit, slot, 0)], -1)

    # Differentiable recomputation of t from the argmin id (piecewise
    # constant) with the exact brute-force formulation.
    safe = jnp.maximum(sphere_id, 0)
    t = ray_sphere_t(o, d, scene.centers[safe], scene.radii[safe])
    t = jnp.where(sphere_id >= 0, t, jnp.inf)
    rec = hit_record_from_t(Ray(origin=o, direction=d), t, sphere_id,
                            scene.centers)
    rec = jax.tree_util.tree_map(
        lambda x: x.reshape(*batch_shape, *x.shape[1:]), rec)
    return rec, overflow


def nearest_hit_tilecull_checked(rays: Ray, scene: Scene, packed: PackedBVH,
                                 table: LeafTable, max_candidates: int = 64,
                                 subpackets: int = 8,
                                 interpret: bool = False) -> HitRecord:
    """Escalating driver: doubles the candidate budget until no subpacket
    overflows (each budget is a separate compiled specialization)."""
    k = max_candidates
    while True:
        rec, overflow = nearest_hit_tilecull(
            rays, scene, packed, table, max_candidates=k,
            subpackets=subpackets, interpret=interpret)
        if not bool(overflow) or k >= table.num_tiles:
            return rec
        k = min(2 * k, ((table.num_tiles + LANES - 1) // LANES) * LANES)
