"""Cone-cull intersector (prim-granular candidates).

SHIPPING STATUS (read this first):
  * Phase A here (``cone_candidates`` + ``compact_ascending_rows`` +
    ``build_cone_tables`` + ``nearest_hit_hybrid_raw``'s phase-A half) IS
    the shipped hot path — bench.py and the CLI route through it.
  * Phase B here (the in-kernel butterfly compaction + accumulator +
    drain: ``_conecull_kernel``/``_conecull_call``/``nearest_hit_conecull``,
    roughly the second half of this file) is EVALUATED, TESTED, AND NOT
    SHIPPING. It measured 25.5 ms vs the 16-wide leafcull kernel's ~15 ms
    at leaf_size=32 (docs/PERF.md "The compaction experiment"): the
    quadratic test is only ~150 ns per 128-prim quad on the VPU, so
    removing tests buys less than the compaction machinery costs at this
    leaf granularity. It is kept because the architecture wins when leaf
    granularity shrinks (8/16-prim leaves) or scenes coarsen. If you are
    optimizing the production query, optimize tracer/kernels/leafcull.py.

Fifth-generation TPU design for the reference's closest-hit query
(``ray_bvh_intersect``, src/hit.c:91-109). The round-3 leafcull kernel
(tracer/kernels/leafcull.py) tests every prim of every candidate LEAF:
measured at 100k spheres a 128-ray subpacket tests ~870-1900 prims where
only ~115 lie in its true corridor — the leaf edge (~68 units) dominates
the corridor cross-section, so most tested prims are dragged in by leaf
granularity (docs/PERF.md). This kernel adds the two stages PERF.md round 3
named as "the right long-term shape": a per-prim CONE test and an
in-register stream compaction, fused into the Pallas kernel so candidates
never leave VMEM:

  1. phase A computes, per 128-ray subpacket, a bounding CONE
     (apex box -> apex + dilation radius, direction box -> axis + half
     angle) and culls with exact cone-vs-sphere tests instead of the
     axis-decorrelated interval slab test -- cheaper (~15 ops vs ~40) and
     tighter for diagonal cones.
  2. the kernel walks candidate leaf quads exactly like leafcull
     (pair-packed lane-replicated entries, 4 arbitrary leaves assembled
     per 128-lane block), but instead of running the quadratic test on
     every assembled block it first cone-tests the 128 prims (ops on one
     (1,128) row), stream-compacts the survivors with a 7-pass butterfly
     network, and appends them to an (8,256) accumulator at a dynamic
     lane offset (pltpu.roll with traced shift). Only when 128 survivors
     have accumulated does the full (SP,128) quadratic block run.
     Survivor rate ~1/8 => ~8x fewer quadratic blocks.

The cone tests are CONSERVATIVE (dilated by r_max + apex radius + slack);
correctness never depends on them -- a prim outside the cone provably
cannot satisfy the reference acceptance rule (disc > 0, near root,
t > EPSILON; src/hit.c:19-39) for any ray of the subpacket, so dropping it
cannot change any result. Degenerate subpackets (direction box straddling
the origin) fall back to accept-all via an inflated dilation radius.

Butterfly compaction correctness: survivors move left by
d[i] = i - pos[i] where pos is the survivor rank; d is non-decreasing in
i. Processing shift bits LSB->MSB, a collision at step k would need an
occupant with remaining shift >= 2^(k+1) and an incomer with total shift
< 2^(k+1) sitting to its right -- contradicting monotonicity, so each
lane holds at most one live element at every step. Sources invalidate
their stale copy the moment they are pulled.
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

from tracer.core.types import Ray, HitRecord
from tracer.bvh.flat import FlatBVH
from tracer.intersect.sphere import ray_sphere_t, hit_record_from_t, EPSILON
from tracer.scene.scene import Scene
from tracer.kernels.leafcull import (CullTables, build_cull_tables,
                                     pack_ray_features, _compact_rows,
                                     FEAT, LANES, SUBLANES, _BIG, _NOSLOT)

CONE_FEAT = 16  # per-subpacket cone scalars, padded to one SMEM word


@flax.struct.dataclass
class ConeTables:
    """CullTables plus the attr-major leaf-box rows + prim dilation bound.

    cull:        the leafcull tables (entries/slot map reused verbatim).
    leaf_boxes:  (Gc, lpg*6) f32 member-leaf AABBs packed attr-major per
                 group row: [lpg lox | loy | loz | hix | hiy | hiz]. The
                 refine gathers whole group rows and slices CONTIGUOUS
                 lane runs per attribute -- the round-3 interval refine
                 gathered box-major rows and paid a (P,48,128) transpose
                 (~4 ms at 512k rays).
    r_max:       float, max prim radius (global conservative dilation for
                 the in-kernel per-prim cone test, which has no per-prim
                 radius row: entries pack |c|^2 - r^2 only).
    """

    cull: CullTables
    leaf_boxes: Array
    r_max: float = flax.struct.field(pytree_node=False)


def build_cone_tables(scene: Scene, bvh: FlatBVH,
                      leaves_per_group: int = 16,
                      max_chunk_bytes: int = 9 << 20) -> ConeTables:
    cull = build_cull_tables(scene, bvh, leaves_per_group=leaves_per_group,
                             max_chunk_bytes=max_chunk_bytes)
    lpg = cull.leaves_per_group
    lmin = np.asarray(cull.leaf_min)   # padding leaves: inverted +-3e38
    lmax = np.asarray(cull.leaf_max)   # boxes, masked by num_real_leaves
    L = cull.num_leaves

    rows = np.empty((L // lpg, lpg * 6), np.float32)
    for a in range(3):
        rows[:, a * lpg:(a + 1) * lpg] = lmin[:, a].reshape(-1, lpg)
        rows[:, (3 + a) * lpg:(4 + a) * lpg] = lmax[:, a].reshape(-1, lpg)

    r_max = float(np.asarray(scene.radii).max()) if scene.radii.size else 0.0
    return ConeTables(cull=cull, leaf_boxes=jnp.asarray(rows), r_max=r_max)


# ---------------------------------------------------------------------------
# Phase A: cone construction + cone-sphere culling
# ---------------------------------------------------------------------------

def _reduce_feats(feats: Array, red):
    """Reduce (G, S, SP, FEAT) over SP -> (P, FEAT) without lane padding.

    A direct ``feats.min(axis=2)`` keeps FEAT(16) as the minor dim, which
    the TPU pads to 128 lanes -- 8x read inflation, measured 2.9 ms per
    reduction at 512k rays. Viewing 8 rays' feature blocks as one 128-lane
    row makes both reduction stages lane-aligned (~0.1 ms).
    """
    G, S, SP, F = feats.shape
    k = LANES // F                                         # rays per row
    v = feats.reshape(G, S, SP // k, k * F)
    v = red(v, axis=2)                                     # (G, S, k*F)
    v = red(v.reshape(G, S, k, F), axis=2)                 # (G, S, F)
    return v.reshape(-1, F)


def bounds_from_feats(feats: Array):
    """Per-subpacket o/d interval bounds from the packed feature planes.

    feats: (G, S, SP, FEAT) from pack_ray_features (lanes 0-2 = d,
    3-5 = -2o). Returns o_lo, o_hi, d_lo, d_hi, each (P, 3). Reducing the
    feature array replaces the round-3 axis-first transposes of the (B,3)
    ray arrays, which measured 9.2 ms at 512k rays.
    """
    lo = _reduce_feats(feats, jnp.min)            # (P, FEAT)
    hi = _reduce_feats(feats, jnp.max)
    d_lo, d_hi = lo[:, 0:3], hi[:, 0:3]
    o_lo, o_hi = hi[:, 3:6] * -0.5, lo[:, 3:6] * -0.5
    return o_lo, o_hi, d_lo, d_hi


def cone_from_feats(feats: Array, o_lo, o_hi, d_lo, d_hi,
                    r_max: float, slack: float = 0.05):
    """Per-subpacket bounding cone with an EXACT direction half-angle,
    packed (P, CONE_FEAT).

    Apex o0 = origin-box center, dilated by the box half-diagonal r_o;
    axis u = normalized direction-box midpoint. cos(theta) is the exact
    min over the subpacket's rays of u.d/|d| (a second reduction over the
    feature planes: u.d from lanes 0-2, |d|^2 from lane 10), minus an fp
    slack. The first-cut interval-corner bound degraded cos by O(theta)
    (measured 0.82 vs a true 0.99 at 512k rays) because box corners are
    not unit directions; the exact two-pass min costs one more cheap
    feats reduction and keeps the cone tight.

    Degenerate subpackets (cos below 0.05: direction box straddling the
    origin, e.g. unsorted rays) get rho = 1e18 => the cone test accepts
    everything (correct, slow).

    Lanes: [o0x o0y o0z ux uy uz rho cos sin rho2 sinrho 0...] where
    rho = r_max + r_o + slack is the PRIM-level dilation.
    """
    tiny = 1e-20
    o0 = 0.5 * (o_lo + o_hi)
    r_o = 0.5 * jnp.sqrt(jnp.sum((o_hi - o_lo) ** 2, axis=1))
    mid = 0.5 * (d_lo + d_hi)
    nrm = jnp.sqrt(jnp.sum(mid * mid, axis=1))
    u = mid / jnp.maximum(nrm, tiny)[:, None]              # (P, 3)

    # Exact per-ray u.d / |d| with every op lane-aligned: view 8 rays'
    # feature blocks as one 128-lane row; per-ray segment sums (u.d) and
    # the lane-10 pick (|d|^2) come out of one fixed (128, 16) f32 matmul
    # against the u-scaled / raw rows. (The naive einsum kept FEAT=16
    # minor and measured 3.5 ms at 512k rays.)
    G, S, SP, F = feats.shape
    k = LANES // F                                         # rays per row
    P = o0.shape[0]
    ucoef = jnp.concatenate(
        [u, jnp.zeros((P, F - 3), jnp.float32)], axis=1)   # (P, F)
    utile = jnp.tile(ucoef, (1, k)).reshape(G, S, 1, k * F)
    v = feats.reshape(G, S, SP // k, k * F)
    seg = jax.lax.broadcasted_iota(jnp.int32, (k * F, k), 0) // F
    col = jax.lax.broadcasted_iota(jnp.int32, (k * F, k), 1)
    msum = (seg == col).astype(jnp.float32)                # (k*F, k)
    ud = jnp.einsum("gsrf,fk->gsrk", v * utile, msum,
                    preferred_element_type=jnp.float32)    # (G,S,SP/k,k)
    m10 = msum * (jax.lax.broadcasted_iota(jnp.int32, (k * F, 1), 0)
                  % F == 10)
    a = jnp.einsum("gsrf,fk->gsrk", v, m10,
                   preferred_element_type=jnp.float32)     # |d|^2 per ray
    dn = jnp.sqrt(jnp.maximum(a, tiny))
    cos_exact = jnp.min((ud / dn).reshape(G, S, SP),
                        axis=2).reshape(-1) - 1e-5
    degenerate = (cos_exact <= 0.05) | (nrm <= tiny)
    cos = jnp.clip(cos_exact, 0.05, 1.0)
    sin = jnp.sqrt(jnp.maximum(1.0 - cos * cos, 0.0))
    rho = r_max + r_o + slack
    rho = jnp.where(degenerate, 1.0e18, rho)

    P = o0.shape[0]
    cols = [o0[:, 0], o0[:, 1], o0[:, 2], u[:, 0], u[:, 1], u[:, 2],
            rho, cos, sin, rho * rho, sin * rho]
    cols += [jnp.zeros((P,), jnp.float32)] * (CONE_FEAT - len(cols))
    return jnp.stack(cols, axis=1).astype(jnp.float32)


def _slab_hit_cols(o_lo, o_hi, d_lo, d_hi, blo, bhi):
    """Interval slab test in column layout (transpose-free).

    o_lo/o_hi/d_lo/d_hi: (P, 3) subpacket interval bounds. blo/bhi:
    3-tuples of broadcastable (1|P, M) box coordinate arrays. Returns
    (P, M) bool -- True whenever ANY ray inside the bounds COULD satisfy
    the reference AABB acceptance (tmax >= tmin && tmax > EPSILON,
    src/hit.c:81). Same interval math as leafcull._interval_slab_hit_t,
    reorganized so every operand keeps P on sublanes and M on lanes.
    """
    big = 1.0e18
    tnear, tfar = None, None
    for a in range(3):
        dl = d_lo[:, a:a + 1]
        dh = d_hi[:, a:a + 1]
        ol = o_lo[:, a:a + 1]
        oh = o_hi[:, a:a + 1]
        free = (dl <= 0.0) & (dh >= 0.0)
        i_lo = 1.0 / jnp.where(free, 1.0, dh)
        i_hi = 1.0 / jnp.where(free, 1.0, dl)

        def imul(al, ah, bl, bh):
            p1, p2, p3, p4 = al * bl, al * bh, ah * bl, ah * bh
            return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                    jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

        n1_lo, n1_hi = blo[a] - oh, blo[a] - ol
        n2_lo, n2_hi = bhi[a] - oh, bhi[a] - ol
        t1_lo, t1_hi = imul(n1_lo, n1_hi, i_lo, i_hi)
        t2_lo, t2_hi = imul(n2_lo, n2_hi, i_lo, i_hi)
        tn = jnp.where(free, -big, jnp.minimum(t1_lo, t2_lo))
        tf = jnp.where(free, big, jnp.maximum(t1_hi, t2_hi))
        tnear = tn if tnear is None else jnp.maximum(tnear, tn)
        tfar = tf if tfar is None else jnp.minimum(tfar, tf)
    return (tfar >= tnear) & (tfar > EPSILON)


def cone_candidates(feats: Array, tables: ConeTables,
                    max_groups: int, max_candidates: int,
                    interpret: bool = False):
    """Cone-based phase A: feature planes -> per-(subpacket, chunk)
    count-embedded candidate leaf rows + per-subpacket cone scalars.

    Same row format / group-mode fallback / chunk handling as
    leafcull.leaf_candidates, with both cull levels swapped to
    cone-vs-sphere tests and the subpacket bounds taken from the feature
    planes. Returns (rows (P, C, rowlen) i32, cones (P, CONE_FEAT) f32,
    overflow () bool).

    NOTE on the prim-level dilation: the kernel's per-prim test uses the
    global r_max because entries carry |c|^2 - r^2, not r. The group/leaf
    levels here use exact per-sphere radii.
    """
    cull = tables.cull
    lpg = cull.leaves_per_group
    lpc = cull.leaves_per_chunk
    C = cull.num_chunks
    G = cull.num_groups
    # Multiple of 8 so the member expansion is a whole number of 128-lane
    # words (lpg = 16).
    k0 = -(-min(max_groups, G) // 8) * 8
    k = min(max_candidates, lpc)
    rowlen = -(-(k + 17) // LANES) * LANES  # leafcull16 overread guard

    o_lo, o_hi, d_lo, d_hi = bounds_from_feats(feats)
    cones = cone_from_feats(feats, o_lo, o_hi, d_lo, d_hi, tables.r_max)
    P = cones.shape[0]

    # Dense level: interval slab vs group AABBs (boxes, not bounding
    # spheres: a 16-leaf group's bounding sphere is ~2x its box extent
    # and measured hopelessly loose -- the slab test keeps the round-3
    # tightness, the column layout drops its relayouts).
    gm, gM = cull.group_min, cull.group_max
    ghit = _slab_hit_cols(o_lo, o_hi, d_lo, d_hi,
                          tuple(gm[None, :, a] for a in range(3)),
                          tuple(gM[None, :, a] for a in range(3)))
    real_group = (jnp.arange(G, dtype=jnp.int32) * lpg
                  < cull.num_real_leaves)
    ghit = ghit & real_group[None, :]
    gids = jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32), ghit.shape)

    # Stream-compact surviving group ids (already ascending) with the
    # butterfly kernel; sentinel G == C * (groups/chunk) lines up with the
    # chunk thresholds below.
    Gpad = -(-G // LANES) * LANES
    gm_ids = jnp.where(ghit, gids, G)
    gm_ids = jnp.pad(gm_ids, ((0, 0), (0, Gpad - G)), constant_values=G)
    K0 = min(Gpad, max(-(-k0 // LANES) * LANES, 4 * LANES))
    gprefix, gtotal = compact_ascending_rows(gm_ids, G, K0,
                                             interpret=interpret)
    gcand = gprefix[:, :k0] if k0 <= K0 else jnp.pad(
        gprefix, ((0, 0), (0, k0 - K0)), constant_values=G)

    # Refine: slab vs member-leaf AABBs, gathered as whole attr-major
    # group rows (contiguous lane slices, no transposes).
    safe_g = jnp.minimum(gcand, G - 1)
    rows_lb = tables.leaf_boxes[safe_g]                    # (P, k0, lpg*6)
    att = [rows_lb[:, :, a * lpg:(a + 1) * lpg].reshape(P, -1)
           for a in range(6)]                              # 6 x (P, k0*lpg)
    member = (gcand[:, :, None] * lpg
              + jnp.arange(lpg, dtype=jnp.int32)[None, None])
    member = member.reshape(P, -1)
    valid = member < cull.num_real_leaves
    lhit = _slab_hit_cols(o_lo, o_hi, d_lo, d_hi,
                          tuple(att[0:3]), tuple(att[3:6])) & valid

    # Per-chunk rows from the compacted prefixes (C+1 threshold reduces +
    # take_along windows, all on narrow arrays). The round-3 formulation
    # ran the same logic after an XLA lane SORT of the full (P, k0*lpg)
    # candidate plane -- 5-8 ms of bitonic passes for ids that were
    # already in order.
    gpc = lpc // lpg
    kg = min(gpc, rowlen - 9)
    refine_truncated = gtotal > k0

    K_l = min(member.shape[1], 4 * LANES)
    lm_ids = jnp.where(lhit, member, C * lpc)
    lprefix, ltotal = compact_ascending_rows(lm_ids, C * lpc, K_l,
                                             interpret=interpret)

    def chunk_rows(prefix, per_chunk, budget):
        """C == 1: per-chunk rows are a plain slice of the global prefix."""
        K = prefix.shape[1]
        j = jnp.arange(budget, dtype=jnp.int32)
        cnt = jnp.sum(prefix < per_chunk, axis=1, dtype=jnp.int32)[:, None]
        head = prefix[:, :budget] if K >= budget else jnp.pad(
            prefix, ((0, 0), (0, budget - K)), constant_values=per_chunk)
        vals = jnp.where(j[None, :] < jnp.minimum(cnt, budget),
                         head, per_chunk)[:, None, :]
        return vals, cnt

    def chunk_rows_multi(mask, ids, per_chunk, budget):
        """C > 1: one butterfly compaction per chunk over the masked id
        plane. The round-4 first cut windowed the global prefix with
        take_along_axis -- P*C*budget ELEMENT gathers, measured ~300 ms
        at 1M spheres (C=15); C small compactor calls are ~10 ms."""
        keepc = -(-min(budget, per_chunk) // LANES) * LANES
        j = jnp.arange(budget, dtype=jnp.int32)
        vals_list, cnt_list = [], []
        for cix in range(C):
            in_c = mask & (ids >= cix * per_chunk) \
                        & (ids < (cix + 1) * per_chunk)
            rel = jnp.where(in_c, ids - cix * per_chunk, per_chunk)
            pref, cnt = compact_ascending_rows(rel, per_chunk, keepc,
                                               interpret=interpret)
            head = pref[:, :budget] if keepc >= budget else jnp.pad(
                pref, ((0, 0), (0, budget - keepc)),
                constant_values=per_chunk)
            vals_list.append(jnp.where(
                j[None, :] < jnp.minimum(cnt[:, None], budget),
                head, per_chunk))
            cnt_list.append(cnt)
        return (jnp.stack(vals_list, axis=1),
                jnp.stack(cnt_list, axis=1))

    if C == 1:
        lvals, lcnt = chunk_rows(lprefix, lpc, k)
        gvals, gcnt = chunk_rows(gprefix, gpc, kg)
    else:
        Mpad = -(-G // LANES) * LANES
        gm_pad = jnp.pad(ghit, ((0, 0), (0, Mpad - G)))
        gid_pad = jnp.pad(gids, ((0, 0), (0, Mpad - G)),
                          constant_values=G)
        lvals, lcnt = chunk_rows_multi(lhit, member, lpc, k)
        gvals, gcnt = chunk_rows_multi(gm_pad, gid_pad, gpc, kg)

    # A truncated prefix (more survivors than K_l/K0 lanes kept) makes the
    # later chunks' windows unreliable -- those rows fall back to group
    # mode / raise overflow, conservatively.
    use_g = ((lcnt > k) | refine_truncated[:, None]
             | (ltotal > K_l)[:, None])
    overflow = jnp.any(use_g & ((gcnt > kg) | (gtotal > K0)[:, None]))

    pad = rowlen - 1 - max(k, kg)
    cnt_col = jnp.where(use_g, -jnp.minimum(gcnt, kg), jnp.minimum(lcnt, k))
    body = jnp.where(use_g[..., None],
                     jnp.pad(gvals, ((0, 0), (0, 0), (0, max(k - kg, 0))),
                             constant_values=gpc),
                     jnp.pad(lvals, ((0, 0), (0, 0), (0, max(kg - k, 0))),
                             constant_values=lpc))
    rows = jnp.concatenate(
        [cnt_col[..., None], body,
         jnp.full((P, C, pad), lpc, jnp.int32)], axis=2)
    # Chunk-major for the kernels' BlockSpec (see leafcull._leafcull_call).
    return rows.transpose(1, 0, 2), cones, overflow


# ---------------------------------------------------------------------------
# Pallas row compactor (phase A): masked ascending ids -> dense prefixes
# ---------------------------------------------------------------------------

def _compact_ids_kernel(ids_ref, out_ref, cnt_ref, scratch_ref, *,
                        sentinel: int, keep: int):
    """(rows, M) masked ascending ids (sentinel = masked out) -> per-row
    compacted prefix (rows, keep) + raw survivor counts (rows, 128).
    Same monotone-shift butterfly as compact_lanes, all rows at once."""
    ids = ids_ref[:]
    M = ids.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, ids.shape, 1)
    mask = (ids != sentinel).astype(jnp.int32)
    csum = mask
    k = 1
    while k < M:
        csum = csum + jnp.where(lane >= k, pltpu.roll(csum, k, axis=1), 0)
        k *= 2
    cnt_ref[:] = jnp.broadcast_to(csum[:, M - 1:M], cnt_ref.shape)
    rem = jnp.where(mask != 0, lane + 1 - csum, 0)
    k = 1
    while k < M:
        in_ids = pltpu.roll(ids, M - k, axis=1)            # left-roll by k
        in_rem = pltpu.roll(rem, M - k, axis=1)
        take = (in_rem & k) != 0
        ids = jnp.where(take, in_ids, ids)
        rem = jnp.where(take, in_rem, rem) & ~k
        k *= 2
    # Stale lanes past each row's count still hold old ids; stamp them
    # back to the sentinel so downstream logic needs no count masking.
    # Slicing the VALUE [:, :keep] at M>=1024 trips a Mosaic
    # vector_extract_strided_slice assertion; bounce through a scratch
    # ref and slice the REF instead (memory op, different code path).
    if keep == M:
        out_ref[:] = jnp.where(lane < csum[:, M - 1:M], ids, sentinel)
    else:
        scratch_ref[:] = jnp.where(lane < csum[:, M - 1:M], ids, sentinel)
        out_ref[:] = scratch_ref[:, :keep]


def compact_ascending_rows(masked_ids: Array, sentinel: int, keep: int,
                           interpret: bool = False):
    """Batch-compact (P, M) rows of masked ASCENDING ids.

    masked_ids: i32, masked-out lanes == sentinel, survivors strictly
    ascending per row (group/member candidate ids are). Returns
    (prefix (P, keep) i32 sentinel-padded, counts (P,) i32 raw).

    This replaces the XLA lane sort the round-3 phase A used for stream
    compaction: a bitonic sort of (4096, 1024) keys measured 5-8 ms on
    v5e where this butterfly kernel runs in ~0.5 ms -- sorting was always
    overkill for ids that are already in order.
    """
    P, M = masked_ids.shape
    assert P % SUBLANES == 0 and M % LANES == 0
    keep = min(keep, M)
    # 64 rows per grid step (a Pallas grid step carries ~2-3 us of fixed
    # overhead on this chip; 8-row steps made the compactor 5x slower),
    # shrunk so the double-buffered in/out/scratch blocks stay well under
    # the VMEM budget at large M (10M-sphere scenes: M ~ 20k).
    rows_per_step = 64
    while rows_per_step > 8 and rows_per_step * M * 4 * 5 > (6 << 20):
        rows_per_step //= 2
    while P % rows_per_step:
        rows_per_step //= 2
    out, cnt = pl.pallas_call(
        functools.partial(_compact_ids_kernel, sentinel=sentinel, keep=keep),
        grid=(P // rows_per_step,),
        in_specs=[pl.BlockSpec((rows_per_step, M), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((rows_per_step, keep), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_step, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, keep), jnp.int32),
            jax.ShapeDtypeStruct((P, LANES), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((rows_per_step, M), jnp.int32)],
        interpret=interpret,
    )(masked_ids)
    return out, cnt[:, 0]


# ---------------------------------------------------------------------------
# Kernel-side compaction primitives
# ---------------------------------------------------------------------------

def _lane_iota(n: int) -> Array:
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)


def _lane_cumsum(x: Array) -> Array:
    """Inclusive cumsum of (1, n) i32 along lanes (log shift-adds;
    jnp.cumsum has no Mosaic lowering)."""
    n = x.shape[1]
    lane = _lane_iota(n)
    k = 1
    while k < n:
        x = x + jnp.where(lane >= k, pltpu.roll(x, k, axis=1), 0)
        k *= 2
    return x


def compact_lanes(payload: Array, mask: Array):
    """Stable left-compaction of masked lanes.

    payload (R, n) f32 (rows move together), mask (1, n) bool. Returns
    (compacted payload, survivor count () i32). Lanes >= count hold stale
    values -- callers mask by count. Butterfly network, log2(n) passes of
    static rolls; see module docstring for the no-collision argument.
    """
    n = payload.shape[1]
    csum = _lane_cumsum(mask.astype(jnp.int32))            # (1, n)
    cnt = jnp.max(csum)                                    # 0-d
    lane = _lane_iota(n)
    # rem = remaining left-shift distance; rem == 0 means "settled or not a
    # survivor" (a settled survivor and a hole behave identically from here
    # on: neither moves, either may be overwritten only by an arrival).
    # A stale source copy is marked dead (rem = 0) the moment it is pulled.
    rem = jnp.where(mask, lane + 1 - csum, 0)
    k, bit = 1, 0
    while k < n:
        in_pay = pltpu.roll(payload, n - k, axis=1)   # left-roll by k
        in_rem = pltpu.roll(rem, n - k, axis=1)
        take = ((in_rem >> bit) & 1) == 1                  # implies in_rem>0
        gone = ((rem >> bit) & 1) == 1
        payload = jnp.where(take, in_pay, payload)
        rem = jnp.where(take, in_rem - k, jnp.where(gone, 0, rem))
        k *= 2
        bit += 1
    return payload, cnt


# ---------------------------------------------------------------------------
# Phase B: the kernel
# ---------------------------------------------------------------------------

def _sentinel_block(n: int = LANES):
    """(8, n) block whose ccr row rejects every ray (same convention as
    the table sentinel entry)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, n), 0)
    return jnp.where(row == 3, 1.0e30, 0.0)


QUADS_PER_ITER = 8      # leaf quads walked per loop iteration
ACC_BLOCKS = 16         # accumulator capacity (128-lane blocks)
WINDOW = QUADS_PER_ITER + 1   # append window: 127 carry + 8*128 appends


def _conecull_kernel(cand_ref, rays_ref, cones_ref, entries_ref,
                     t_ref, slot_ref, acc_ref, w_ref, ub_ref, ib_ref,
                     cnt_ref, *,
                     subpackets: int, subpacket: int, leaf_size: int,
                     leaves_per_chunk: int, leaves_per_group: int):
    """Grid (C, G), chunk-major (same schedule as leafcull). Per subpacket:
    walk candidate leaf quads QUADS_PER_ITER at a time; per iteration:
    assemble + cone-refine all 8 quads, butterfly-compact them as ONE
    batched (64, 128) payload stream, tree-merge the 8 compacted runs,
    and append once into the block-major (8, 16, 128) accumulator at a
    dynamic block offset. Full blocks are quadratic-tested by a drain
    loop after the walk (plus a rare mid-walk overflow drain).

    Structure is dictated by measured Mosaic facts (micro benches, v5e):
    (a) a fori_loop iteration costs ~300-450 ns regardless of body size
    up to ~150 vector ops -- so the loop walks 8 quads per iteration;
    (b) per-quad butterfly chains do NOT interleave (measured 165 cyc
    each) -- batching them into one (64,128) stream runs the network once
    at 8x width; (c) a @pl.when branch costs ~190 ns -- so full blocks
    drain through a fori over the block-major accumulator instead of a
    per-block branch cascade; (d) lax.cond over vector carries fails to
    legalize, so all walk state lives in scratch refs.
    """
    SP = subpacket
    ls = leaf_size
    LPG = leaves_per_group
    QPI = QUADS_PER_ITER
    rowlen = cand_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    quarter = lane // ls
    lane_mod = lane % ls
    c = pl.program_id(0)
    chunk_slot0 = c * leaves_per_chunk * ls

    t_cols = []
    slot_cols = []
    for s in range(subpackets):
        f = rays_ref[0, s]                                 # (SP, FEAT)
        od, oo = f[:, 8:9], f[:, 9:10]
        av, inva = f[:, 10:11], f[:, 11:12]
        epsa = f[:, 12:13]
        dx, dy, dz = f[:, 0:1], f[:, 1:2], f[:, 2:3]
        nox2, noy2, noz2 = f[:, 3:4], f[:, 4:5], f[:, 5:6]
        nc = cand_ref[0, 0, s, 0]

        o0x = cones_ref[0, 0, s, 0]
        o0y = cones_ref[0, 0, s, 1]
        o0z = cones_ref[0, 0, s, 2]
        ux = cones_ref[0, 0, s, 3]
        uy = cones_ref[0, 0, s, 4]
        uz = cones_ref[0, 0, s, 5]
        cth = cones_ref[0, 0, s, 7]
        rho2 = cones_ref[0, 0, s, 9]
        sinrho = cones_ref[0, 0, s, 10]

        for b in range(ACC_BLOCKS):
            acc_ref[:, b, :] = _sentinel_block()
        w_ref[0] = 0
        ub_ref[:] = jnp.full((SP, LANES), -_BIG, jnp.float32)
        ib_ref[:] = jnp.full((SP, LANES), _NOSLOT, jnp.int32)

        def refine(A):
            """(4,128) assembled attrs -> (1,128) survivor mask."""
            cx, cy, cz, ccr = A[0:1], A[1:2], A[2:3], A[3:4]
            vx = cx - o0x
            vy = cy - o0y
            vz = cz - o0z
            d2 = vx * vx + vy * vy + vz * vz
            uv = ux * vx + uy * vy + uz * vz
            q = d2 - rho2
            sq = jnp.sqrt(jnp.maximum(q, 0.0))
            ok = (uv + sinrho >= cth * sq) | (q <= 0.0)
            return ok & (ccr < 1.0e29)

        def test_block(A):
            """Quadratic-test one (8,128) accumulator block into ub/ib.
            Sentinel ccr=1e30 lanes can never pass. Reference acceptance
            semantics (disc > 0, near root, t > EPSILON; src/hit.c:19-39)
            in the u = -t*a domain, as in leafcull."""
            cx, cy, cz, ccr = A[0:1], A[1:2], A[2:3], A[3:4]
            pslot = A[4:5].astype(jnp.int32)
            ub = ub_ref[:]
            m1 = dx * cx + dy * cy + dz * cz
            m2 = nox2 * cx + noy2 * cy + noz2 * cz + ccr
            bp = od - m1
            cq = m2 + oo
            disc = bp * bp - av * cq
            u = bp + jnp.sqrt(jnp.maximum(disc, 0.0))
            ok = (disc > 0.0) & (u < -epsa) & (u > ub)
            ub_ref[:] = jnp.where(ok, u, ub)
            ib_ref[:] = jnp.where(ok, pslot, ib_ref[:])

        def assemble(lids):
            """4 leaf ids -> (payload (8,128), mask (1,128))."""
            loads = []
            for l in lids:
                e = entries_ref[0, l // 2]                 # (8, 128)
                loads.append(jax.lax.select(l % 2 == 0, e[0:4], e[4:8]))
            A = jnp.where(quarter % 4 < 2,
                          jnp.where(quarter % 4 == 0, loads[0], loads[1]),
                          jnp.where(quarter % 4 == 2, loads[2], loads[3]))
            lid = jnp.where(
                quarter % 4 < 2,
                jnp.where(quarter % 4 == 0, lids[0], lids[1]),
                jnp.where(quarter % 4 == 2, lids[2], lids[3]))
            pslot = (chunk_slot0 + lid * ls + lane_mod).astype(jnp.float32)
            payload = jnp.concatenate(
                [A, pslot, jnp.zeros((3, LANES), jnp.float32)], axis=0)
            # i32 mask: Mosaic cannot concatenate i1 vectors (the batched
            # compactor stacks the 8 quad masks into one (8,128) plane).
            return payload, refine(A).astype(jnp.int32)

        def batched_compact(payloads, masks):
            """Butterfly-compact 8 quads at once.

            payloads: list of 8 (8,128); masks: list of 8 (1,128) bool.
            One (64,128) payload stream + one (8,128) mask plane run the
            7-pass network ONCE at 8x width (separate per-quad chains
            measured 165 cyc each -- they do not interleave). Returns
            (payload64, per-quad counts as 8 python-side scalars read
            back through the cnt scratch).
            """
            m8 = jnp.concatenate(masks, axis=0)            # (8, 128) i32
            p64 = jnp.concatenate(payloads, axis=0)        # (64, 128)
            csum = m8
            k = 1
            while k < LANES:
                csum = csum + jnp.where(lane8 >= k,
                                        pltpu.roll(csum, k, axis=1), 0)
                k *= 2
            cnt_ref[:] = csum
            rem = jnp.where(m8 != 0, lane8 + 1 - csum, 0)
            k = 1
            while k < LANES:
                in_pay = pltpu.roll(p64, LANES - k, axis=1)
                in_rem = pltpu.roll(rem, LANES - k, axis=1)
                take8 = (in_rem & k) != 0
                take64 = jnp.broadcast_to(
                    take8[:, None, :], (QPI, SUBLANES, LANES)
                ).reshape(QPI * SUBLANES, LANES)
                p64 = jnp.where(take64, in_pay, p64)
                rem = jnp.where(take8, in_rem, rem) & ~k
                k *= 2
            cnts = [cnt_ref[q, LANES - 1] for q in range(QPI)]
            return p64, cnts

        def merge(a, b):
            """Concatenate two equal-width compacted runs (pay, cnt)."""
            (a_pay, a_cnt), (b_pay, b_cnt) = a, b
            w = a_pay.shape[1]
            s2 = _sentinel_block(w)
            a2 = jnp.concatenate([a_pay, s2], axis=1)
            b2 = jnp.concatenate([b_pay, s2], axis=1)
            rolledb = pltpu.roll(b2, a_cnt, axis=1)        # no wrap: cnts<=w
            l2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * w), 1)
            sel = (l2 >= a_cnt) & (l2 < a_cnt + b_cnt)
            return jnp.where(sel, rolledb, a2), a_cnt + b_cnt

        def drain(nb):
            """Quadratic-test accumulator blocks [0, nb)."""
            def body(b, carry):
                test_block(acc_ref[:, b, :])
                return carry
            jax.lax.fori_loop(0, nb, body, 0)

        def push_iteration(quads):
            """Compact + merge this iteration's 8 quads, append once into
            the window at the current write offset; drain on (rare)
            overflow."""
            p64, cnts = batched_compact([p for p, _ in quads],
                                        [m for _, m in quads])
            runs = [(p64[8 * q:8 * q + 8], cnts[q]) for q in range(QPI)]
            while len(runs) > 1:
                runs = [merge(runs[i], runs[i + 1])
                        for i in range(0, len(runs), 2)]
            run, cnt = runs[0]
            W = w_ref[0]
            kb = W // LANES
            wr = W - kb * LANES
            wide = jnp.concatenate([run, _sentinel_block()], axis=1)
            rolled = pltpu.roll(wide, wr, axis=1)          # wr<128, no wrap
            lw = jax.lax.broadcasted_iota(jnp.int32, (1, WINDOW * LANES), 1)
            sel = (lw >= wr) & (lw < wr + cnt)
            win = acc_ref[:, pl.ds(kb, WINDOW), :].reshape(
                SUBLANES, WINDOW * LANES)
            win = jnp.where(sel, rolled, win)
            acc_ref[:, pl.ds(kb, WINDOW), :] = win.reshape(
                SUBLANES, WINDOW, LANES)
            w_ref[0] = W + cnt

            nkeep = ACC_BLOCKS - WINDOW                    # drain threshold
            # Two statically-unrolled drain passes guarantee the invariant
            # W < nkeep*LANES at every push entry (so kb + WINDOW never
            # indexes past ACC_BLOCKS). One pass is NOT enough: a push can
            # append up to QPI*LANES = 1024 survivor lanes while a drain
            # removes only nkeep*LANES = 896, so under sustained full
            # survivor rates (degenerate-cone accept-all fallback) W grows
            # ~+128/push until the window write goes out of bounds. With
            # the invariant, post-append W <= (nkeep*LANES - 1) + 1024 =
            # 1919 < 2*nkeep*LANES, so two passes always restore it.
            for _ in range(2):
                @pl.when(w_ref[0] >= nkeep * LANES)
                def _():
                    drain(nkeep)
                    for b in range(WINDOW):
                        acc_ref[:, b, :] = acc_ref[:, nkeep + b, :]
                    for b in range(WINDOW, ACC_BLOCKS):
                        acc_ref[:, b, :] = _sentinel_block()
                    w_ref[0] = w_ref[0] - nkeep * LANES

        @pl.when(nc >= 0)
        def _(s=s):
            def body(it, carry, s=s):
                quads = []
                for q in range(QPI):
                    jq = it * QPI + q
                    lids = [
                        jnp.minimum(
                            cand_ref[0, 0, s,
                                     jnp.minimum(1 + 4 * jq + t, rowlen - 1)],
                            leaves_per_chunk)
                        for t in range(4)]
                    quads.append(assemble(lids))
                push_iteration(quads)
                return carry
            nq = (nc + 3) // 4
            jax.lax.fori_loop(0, (nq + QPI - 1) // QPI, body, 0)

        @pl.when(nc < 0)
        def _(s=s):
            qpg = LPG // 4                                 # quads per group
            def body(it, carry, s=s):
                quads = []
                for q in range(QPI):
                    jq = it * QPI + q
                    g = cand_ref[0, 0, s,
                                 jnp.minimum(1 + jq // qpg, rowlen - 1)]
                    base = g * LPG + (jq % qpg) * 4
                    lids = [jnp.minimum(base + t, leaves_per_chunk)
                            for t in range(4)]
                    quads.append(assemble(lids))
                push_iteration(quads)
                return carry
            nq = -nc * qpg
            jax.lax.fori_loop(0, (nq + QPI - 1) // QPI, body, 0)

        # Drain every (possibly partial) block; lanes past W are sentinel.
        drain((w_ref[0] + LANES - 1) // LANES)

        ub, ib = ub_ref[:], ib_ref[:]
        umax = jnp.max(ub, axis=1, keepdims=True)
        win = (ub == umax) & (ib < _NOSLOT)
        slot = jnp.min(jnp.where(win, ib, _NOSLOT), axis=1, keepdims=True)
        t_cols.append(-umax * inva)
        slot_cols.append(slot)

    t_ref[0, 0] = jnp.concatenate(t_cols, axis=1)
    slot_ref[0, 0] = jnp.concatenate(slot_cols, axis=1)


@functools.partial(jax.jit, static_argnames=(
    "subpackets", "subpacket", "leaf_size", "leaves_per_chunk",
    "leaves_per_group", "interpret"))
def _conecull_call(feats: Array, cand: Array, cones: Array, entries: Array,
                   subpackets: int, subpacket: int, leaf_size: int,
                   leaves_per_chunk: int, leaves_per_group: int,
                   interpret: bool = False):
    g = feats.shape[0]
    C = entries.shape[0]
    S, SP = subpackets, subpacket
    rowlen = cand.shape[-1]
    kernel = functools.partial(
        _conecull_kernel, subpackets=S, subpacket=SP, leaf_size=leaf_size,
        leaves_per_chunk=leaves_per_chunk, leaves_per_group=leaves_per_group)
    t_c, slot_c = pl.pallas_call(
        kernel,
        grid=(C, g),
        in_specs=[
            pl.BlockSpec((1, 1, S, rowlen), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, SP, FEAT), lambda c, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, CONE_FEAT), lambda c, i: (i, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,) + entries.shape[1:], lambda c, i: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, SP, S), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SP, S), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, g, SP, S), jnp.float32),
            jax.ShapeDtypeStruct((C, g, SP, S), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, ACC_BLOCKS, LANES), jnp.float32),   # acc
            pltpu.SMEM((1,), jnp.int32),                      # write offset
            pltpu.VMEM((SP, LANES), jnp.float32),             # best u
            pltpu.VMEM((SP, LANES), jnp.int32),               # best slot
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),         # quad counts
        ],
        interpret=interpret,
    )(cand, feats, cones, entries)
    if C == 1:
        return t_c[0], slot_c[0]
    tm = jnp.where(slot_c < _NOSLOT, t_c, _BIG)
    ci = jnp.argmin(tm, axis=0)[None]
    t = jnp.take_along_axis(t_c, ci, axis=0)[0]
    slot = jnp.take_along_axis(slot_c, ci, axis=0)[0]
    return t, slot


def _run(rays: Ray, tables: ConeTables, max_groups: int,
         max_candidates: int, subpackets: int, subpacket: int,
         interpret: bool):
    cull = tables.cull
    batch_shape = rays.batch_shape
    o = rays.origin.reshape(-1, 3)
    d = rays.direction.reshape(-1, 3)
    b = o.shape[0]

    feats, g, pad = pack_ray_features(o, d, subpackets, subpacket)
    rows, cones, overflow = cone_candidates(feats, tables, max_groups,
                                            max_candidates,
                                            interpret=interpret)
    rows = rows.reshape(cull.num_chunks, g, subpackets, rows.shape[-1])
    cones = cones.reshape(g, 1, subpackets, CONE_FEAT)

    t_k, slot = _conecull_call(feats, rows, cones, cull.entries, subpackets,
                               subpacket, cull.leaf_size,
                               cull.leaves_per_chunk, cull.leaves_per_group,
                               interpret=interpret)
    slot = slot.transpose(0, 2, 1).reshape(-1)[:b]
    t_k = t_k.transpose(0, 2, 1).reshape(-1)[:b]
    return o, d, slot, t_k, overflow, batch_shape


@functools.partial(jax.jit, static_argnames=(
    "max_groups", "max_candidates", "subpackets", "subpacket", "interpret"))
def nearest_hit_conecull_t(rays: Ray, tables: ConeTables,
                           max_groups: int = 64, max_candidates: int = 119,
                           subpackets: int = 8, subpacket: int = 128,
                           interpret: bool = False):
    """Lite closest hit: (t, sphere_id, overflow) straight from the kernel
    (same contract as leafcull.nearest_hit_leafcull_t)."""
    o, d, slot, t_k, overflow, batch_shape = _run(
        rays, tables, max_groups, max_candidates, subpackets, subpacket,
        interpret)
    cull = tables.cull
    hit = slot < _NOSLOT
    sphere_id = jnp.where(
        hit, cull.slot_to_sphere[jnp.where(hit, slot, 0)], -1)
    t = jnp.where(hit, t_k, jnp.inf)
    return (t.reshape(batch_shape), sphere_id.reshape(batch_shape), overflow)


@functools.partial(jax.jit, static_argnames=(
    "max_groups", "max_candidates", "subpackets", "subpacket", "interpret"))
def nearest_hit_conecull(rays: Ray, scene: Scene, tables: ConeTables,
                         max_groups: int = 64, max_candidates: int = 119,
                         subpackets: int = 8, subpacket: int = 128,
                         interpret: bool = False):
    """Closest hit via cone cull + compacted prim tests.

    Rays should be pre-sorted (tracer/core/sort.py). Returns
    ``(HitRecord, overflow)``; on overflow re-dispatch with larger budgets
    (``nearest_hit_conecull_checked`` automates this)."""
    o, d, slot, _, overflow, batch_shape = _run(
        rays, tables, max_groups, max_candidates, subpackets, subpacket,
        interpret)
    cull = tables.cull
    hit = slot < _NOSLOT
    sphere_id = jnp.where(
        hit, cull.slot_to_sphere[jnp.where(hit, slot, 0)], -1)

    safe = jnp.maximum(sphere_id, 0)
    t = ray_sphere_t(o, d, scene.centers[safe], scene.radii[safe])
    t = jnp.where(sphere_id >= 0, t, jnp.inf)
    rec = hit_record_from_t(Ray(origin=o, direction=d), t, sphere_id,
                            scene.centers)
    rec = jax.tree_util.tree_map(
        lambda x: x.reshape(*batch_shape, *x.shape[1:]), rec)
    return rec, overflow


def kernel_order_dest(dest: Array, subpackets: int, subpacket: int) -> Array:
    """Remap a prep ``dest`` (padded-stream slots) to the cull kernels' raw
    output order, so results can be consumed without the (g, SP, S) ->
    flat transpose (measured ~2-4 ms at 512k rays in the epilogue).

    Padded slot b = (g*S + s)*SP + r sits at kernel flat index
    g*SP*S + r*S + s. Pure elementwise; compute it once per prep.
    """
    S, SP = subpackets, subpacket
    g = dest // (S * SP)
    rem = dest - g * (S * SP)
    s = rem // SP
    r = rem - s * SP
    return g * (SP * S) + r * S + s


@functools.partial(jax.jit, static_argnames=(
    "max_groups", "max_candidates", "subpackets", "subpacket", "interpret"))
def nearest_hit_hybrid_raw(rays: Ray, tables: ConeTables,
                           max_groups: int = 64, max_candidates: int = 119,
                           subpackets: int = 8, subpacket: int = 128,
                           interpret: bool = False):
    """Raw-order lite closest hit: (t, slot_id, overflow) in the kernel's
    native flat order (index results with ``kernel_order_dest``).

    t is +inf on miss. slot_id is the hit prim's SLOT index -- the
    framework's canonical BVH-order id space (map to input order with
    tables.cull.slot_to_sphere outside the hot path). Skipping the layout
    transpose and the slot->sphere gather saves ~8 ms at 512k rays.
    """
    from tracer.kernels.leafcull import _leafcull_call

    cull = tables.cull
    o = rays.origin.reshape(-1, 3)
    d = rays.direction.reshape(-1, 3)

    feats, g, pad = pack_ray_features(o, d, subpackets, subpacket)
    rows, _, overflow = cone_candidates(feats, tables, max_groups,
                                        max_candidates,
                                        interpret=interpret)
    rows = rows.reshape(cull.num_chunks, g, subpackets, rows.shape[-1])
    t_k, slot = _leafcull_call(feats, rows, cull.entries, subpackets,
                               subpacket, cull.leaf_size,
                               cull.leaves_per_chunk, cull.leaves_per_group,
                               interpret=interpret)
    slot = slot.reshape(-1)
    t_k = t_k.reshape(-1)
    hit = slot < _NOSLOT
    t = jnp.where(hit, t_k, jnp.inf)
    return t, jnp.where(hit, slot, -1), overflow


@functools.partial(jax.jit, static_argnames=(
    "max_groups", "max_candidates", "interpret"))
def nearest_hit_hybrid_feats(feats: Array, tables: ConeTables,
                             max_groups: int = 64,
                             max_candidates: int = 119,
                             interpret: bool = False):
    """Raw-order lite closest hit from PREBUILT feature planes.

    Same contract as :func:`nearest_hit_hybrid_raw` but takes the
    (G, S, SP, FEAT) operand from leafcull.prep_feats_bucketed directly —
    the round-5 prep never materializes padded (bp, 3) ray arrays at all
    (their 3 -> 128 lane tiling cost ~5 ms at 512k rays)."""
    from tracer.kernels.leafcull import _leafcull_call

    cull = tables.cull
    g, S, SP, _ = feats.shape
    rows, _, overflow = cone_candidates(feats, tables, max_groups,
                                        max_candidates, interpret=interpret)
    rows = rows.reshape(cull.num_chunks, g, S, rows.shape[-1])
    t_k, slot = _leafcull_call(feats, rows, cull.entries, S, SP,
                               cull.leaf_size, cull.leaves_per_chunk,
                               cull.leaves_per_group, interpret=interpret)
    slot = slot.reshape(-1)
    t_k = t_k.reshape(-1)
    hit = slot < _NOSLOT
    return jnp.where(hit, t_k, jnp.inf), jnp.where(hit, slot, -1), overflow


@functools.partial(jax.jit, static_argnames=(
    "max_groups", "max_candidates", "interpret"))
def occluded_hybrid_feats(feats: Array, tables: ConeTables,
                          max_groups: int = 64, max_candidates: int = 119,
                          interpret: bool = False):
    """Raw-order any-hit (shadow) query from prebuilt feature planes.

    feats must be packed with a finite t_max (leafcull.prep_feats_bucketed
    / pack_ray_features ``t_max=``). Returns (occluded (bp,) i32 in raw
    kernel order, overflow)."""
    from tracer.kernels.leafcull import _anyhit_call

    cull = tables.cull
    g, S, SP, _ = feats.shape
    rows, _, overflow = cone_candidates(feats, tables, max_groups,
                                        max_candidates, interpret=interpret)
    rows = rows.reshape(cull.num_chunks, g, S, rows.shape[-1])
    occ = _anyhit_call(feats, rows, cull.entries, S, SP, cull.leaf_size,
                       cull.leaves_per_chunk, cull.leaves_per_group,
                       interpret=interpret)
    return occ.reshape(-1), overflow


@functools.partial(jax.jit, static_argnames=(
    "max_groups", "max_candidates", "subpackets", "subpacket", "interpret"))
def nearest_hit_hybrid_t(rays: Ray, tables: ConeTables,
                         max_groups: int = 64, max_candidates: int = 119,
                         subpackets: int = 8, subpacket: int = 128,
                         interpret: bool = False):
    """Lite closest hit: round-4 transpose-free phase A (cone_candidates,
    minus the cone scalars) feeding the proven 16-wide leafcull kernel.
    Same row format, same (t, sphere_id, overflow) contract as
    leafcull.nearest_hit_leafcull_t."""
    from tracer.kernels.leafcull import _leafcull_call

    cull = tables.cull
    batch_shape = rays.batch_shape
    o = rays.origin.reshape(-1, 3)
    d = rays.direction.reshape(-1, 3)
    b = o.shape[0]

    feats, g, pad = pack_ray_features(o, d, subpackets, subpacket)
    rows, _, overflow = cone_candidates(feats, tables, max_groups,
                                        max_candidates,
                                        interpret=interpret)
    rows = rows.reshape(cull.num_chunks, g, subpackets, rows.shape[-1])
    t_k, slot = _leafcull_call(feats, rows, cull.entries, subpackets,
                               subpacket, cull.leaf_size,
                               cull.leaves_per_chunk, cull.leaves_per_group,
                               interpret=interpret)
    slot = slot.transpose(0, 2, 1).reshape(-1)[:b]
    t_k = t_k.transpose(0, 2, 1).reshape(-1)[:b]
    hit = slot < _NOSLOT
    sphere_id = jnp.where(
        hit, cull.slot_to_sphere[jnp.where(hit, slot, 0)], -1)
    t = jnp.where(hit, t_k, jnp.inf)
    return (t.reshape(batch_shape), sphere_id.reshape(batch_shape), overflow)


def nearest_hit_conecull_checked(rays: Ray, scene: Scene, tables: ConeTables,
                                 max_groups: int = 64,
                                 max_candidates: int = 119,
                                 subpackets: int = 8, subpacket: int = 128,
                                 interpret: bool = False) -> HitRecord:
    """Escalating driver: doubles both candidate budgets until no subpacket
    overflows."""
    cull = tables.cull
    k0, k = max_groups, max_candidates
    while True:
        rec, overflow = nearest_hit_conecull(
            rays, scene, tables, max_groups=k0, max_candidates=k,
            subpackets=subpackets, subpacket=subpacket, interpret=interpret)
        done = (k0 >= cull.num_groups) and (k >= cull.leaves_per_chunk)
        if not bool(overflow) or done:
            return rec
        k0 = min(2 * k0, cull.num_groups)
        k = min(2 * k, cull.leaves_per_chunk)
