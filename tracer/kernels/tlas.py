"""TLAS-routed multi-chunk closest hit (10M+ sphere scenes).

The round-4 multi-chunk path ran a DENSE (chunk x g-block) kernel grid and
a per-chunk compaction loop in phase A: at 10M spheres (C ~ 70 chunks of
~9 MB prim entries each) that is ~37k grid steps of which >90% carry no
work — each still paying the ~2.5 us Pallas step floor — plus C butterfly
compactor calls and a (P, C, rowlen) candidate buffer that scales to GBs
at 100M. The reference's flagship property (BVH time nearly flat out to
100M spheres, results/benchmark_data.txt:1-6) dies in that overhead.

This module adds the missing TOP LEVEL of the hierarchy (the TLAS of a
two-level BVH, SURVEY.md §2 "scene/param sharding" BLAS/TLAS vocabulary,
here applied single-chip):

  1. ROUTE:  per-subpacket interval bounds vs per-CHUNK AABBs -> a flat
     list of (chunk, g-block) PAIRS that might interact, sorted
     chunk-major (one 2-operand XLA sort of the C*g routing matrix).
     Empty pairs never exist anywhere downstream: not in phase A, not in
     the kernel grid, not in memory.
  2. PHASE A per pair: the cone/slab group test + leaf refine of
     tracer/kernels/conecull.cone_candidates, restricted to the pair's
     chunk (ids come out chunk-RELATIVE for free), batched over ALL pairs
     in one pipeline — no per-chunk Python loop, C never appears as an
     array axis.
  3. KERNEL grid (Npairs,): scalar-prefetched pair tables drive the
     BlockSpec index maps (pltpu.PrefetchScalarGridSpec) — the feats
     block comes from pair_gb[p], the prim entries block from pair_c[p].
     Pairs are chunk-major, so consecutive steps reuse the resident
     entries block (Pallas skips the DMA when the block index repeats);
     total table traffic stays ~ table size per call.
  4. MERGE: per g-block, gather its <= Kc partial (SP, S) result blocks
     by routed-pair position and min-reduce — first minimal t in
     ascending chunk order, matching brute force's first-hit tie-break.

Budgets (Npairs, Kc) are static; exceeding either raises the overflow
flag and the caller escalates, exactly like the group/leaf budgets of
the round-3/4 phase A.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.kernels.leafcull import (FEAT, LANES, _BIG, _NOSLOT,
                                     _leafcull_step)
from tracer.kernels.conecull import (ConeTables, bounds_from_feats,
                                     _slab_hit_cols, compact_ascending_rows)


def route_pairs(o_lo, o_hi, d_lo, d_hi, tables: ConeTables, subpackets: int,
                npairs: int, kc: int, interpret: bool = False):
    """Chunk-level routing. bounds: (P, 3) with P = g * subpackets.

    Returns (pair_c (Npairs,), pair_gb (Npairs,), pair_active (Npairs,),
    merge_pos (g, Kc) i32 routed-pair positions (= Npairs where unused),
    overflow ()). Pairs are sorted chunk-major (ascending c, then gb).
    """
    cull = tables.cull
    C = cull.num_chunks
    S = subpackets
    P = o_lo.shape[0]
    g = P // S
    gpc = cull.leaves_per_chunk // cull.leaves_per_group

    # Chunk AABBs from the group boxes (exact reshape: groups are laid out
    # chunk-contiguously, L = C * lpc, G = L / lpg).
    cmin = cull.group_min.reshape(C, gpc, 3).min(1)        # (C, 3)
    cmax = cull.group_max.reshape(C, gpc, 3).max(1)
    real_chunk = (jnp.arange(C, dtype=jnp.int32) * cull.leaves_per_chunk
                  < cull.num_real_leaves)

    chit = _slab_hit_cols(o_lo, o_hi, d_lo, d_hi,
                          tuple(cmin[None, :, a] for a in range(3)),
                          tuple(cmax[None, :, a] for a in range(3)))
    chit = chit & real_chunk[None, :]
    gbhit = jnp.any(chit.reshape(g, S, C), axis=1)         # (g, C)

    # Flat chunk-major pair list by one 2-operand sort of the C*g matrix.
    flat = gbhit.T.reshape(-1)                             # (C*g,) c-major
    cg = jnp.arange(C * g, dtype=jnp.int32)
    key = jnp.where(flat, cg, jnp.int32(C * g))
    skey = jax.lax.sort(key, dimension=0)
    total = jnp.sum(flat, dtype=jnp.int32)
    take = skey[:npairs] if skey.shape[0] >= npairs else jnp.pad(
        skey, ((0, npairs - skey.shape[0]),), constant_values=C * g)
    active = take < C * g
    pair_c = jnp.where(active, take // g, C - 1)
    pair_gb = jnp.where(active, take % g, 0)

    # Merge-side inverse: for each g-block, its routed chunks (ascending)
    # and each pair's position in the flat list.
    ccnt = jnp.sum(gbhit, axis=0, dtype=jnp.int32)         # (C,)
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(ccnt)[:-1].astype(jnp.int32)])
    jrank = jnp.cumsum(gbhit.astype(jnp.int32), axis=0) - 1  # (g, C)
    Cpad = -(-C // LANES) * LANES
    gpad8 = (-g) % 8   # compactor wants a multiple-of-8 row count
    cids_m = jnp.where(gbhit, jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32), (g, C)), C)
    cids_m = jnp.pad(cids_m, ((0, gpad8), (0, Cpad - C)), constant_values=C)
    kck = min(-(-kc // LANES) * LANES, Cpad)
    cpref, ccount = compact_ascending_rows(cids_m, C, kck,
                                           interpret=interpret)
    cpref, ccount = cpref[:g], ccount[:g]
    kc_eff = min(kc, kck)
    cpref = cpref[:, :kc_eff]
    safe_c = jnp.minimum(cpref, C - 1)
    jr = jnp.take_along_axis(jrank, safe_c, axis=1)        # (g, kc)
    pos = base[safe_c] + jr
    valid = (cpref < C) & (pos < npairs)
    merge_pos = jnp.where(valid, pos, npairs)
    overflow = (total > npairs) | jnp.any(ccount > kc_eff)
    return pair_c, pair_gb, active, merge_pos, overflow


def tlas_candidates(feats: Array, tables: ConeTables, max_groups: int,
                    max_candidates: int, npairs: int, kc: int,
                    pair_block: int = 8192, interpret: bool = False):
    """Routed phase A: feats (g, S, SP, FEAT) -> per-pair candidate rows.

    Returns (rows (Npairs, S, rowlen) i32 chunk-RELATIVE count-embedded
    rows, pair_c, pair_gb, merge_pos, overflow). Row format identical to
    conecull.cone_candidates (count >= 0: leaf ids; count < 0: group ids,
    both relative to the pair's chunk; sentinel-padded).
    """
    cull = tables.cull
    lpg = cull.leaves_per_group
    lpc = cull.leaves_per_chunk
    gpc = lpc // lpg
    C = cull.num_chunks
    g, S, SP, F = feats.shape

    k0 = max(8, -(-min(max_groups, gpc) // 8) * 8)
    while k0 * lpg > 1024:      # butterfly compactor row-width ceiling
        k0 -= 8
    k = min(max_candidates, lpc)
    rowlen = -(-(k + 17) // LANES) * LANES
    kg = min(gpc, rowlen - 9)

    o_lo, o_hi, d_lo, d_hi = bounds_from_feats(feats)      # (P, 3)
    pair_c, pair_gb, pair_active, merge_pos, r_ovf = route_pairs(
        o_lo, o_hi, d_lo, d_hi, tables, S, npairs, kc, interpret=interpret)

    packed_all = jnp.concatenate([o_lo, o_hi, d_lo, d_hi],
                                 axis=1).reshape(g, S * 12)  # (g, 12*S)
    gpc_pad = -(-gpc // LANES) * LANES
    K0 = min(gpc_pad, max(-(-k0 // LANES) * LANES, LANES))

    # Pairs are processed in fixed-size BLOCKS under lax.map: phase A's
    # per-pair intermediates scale with block_size * k0 * lpg (the leaf
    # refine gathers (P2, k0, lpg*6) box rows — at 100M spheres the
    # unblocked form materialized 6.7 GB twice and exhausted HBM).
    blk = min(npairs, pair_block)
    npad = (-npairs) % blk
    pc_b = jnp.pad(pair_c, ((0, npad),)).reshape(-1, blk)
    pg_b = jnp.pad(pair_gb, ((0, npad),)).reshape(-1, blk)
    act_b = jnp.pad(pair_active, ((0, npad),)).reshape(-1, blk)

    def one_block(args):
        pair_c, pair_gb, pair_active = args
        np_ = blk
        P2 = np_ * S
        pb = packed_all[pair_gb].reshape(P2, 12)
        po_lo, po_hi = pb[:, 0:3], pb[:, 3:6]
        pd_lo, pd_hi = pb[:, 6:9], pb[:, 9:12]

        # Group test inside the pair's chunk: whole (gpc*3) row gathers,
        # broadcast over the pair's S subpackets.
        gmin_c = cull.group_min.reshape(C, gpc * 3)[pair_c]
        gmax_c = cull.group_max.reshape(C, gpc * 3)[pair_c]

        def _cols(x):
            v = x.reshape(np_, 1, gpc, 3)
            v = jnp.broadcast_to(v, (np_, S, gpc, 3)).reshape(P2, gpc, 3)
            return tuple(v[:, :, a] for a in range(3))

        ghit = _slab_hit_cols(po_lo, po_hi, pd_lo, pd_hi,
                              _cols(gmin_c), _cols(gmax_c))  # (P2, gpc)
        gid_rel = jnp.broadcast_to(jnp.arange(gpc, dtype=jnp.int32),
                                   (P2, gpc))
        gid_global = (pair_c[:, None] * gpc
                      + jnp.arange(gpc, dtype=jnp.int32)[None])
        real = (gid_global * lpg < cull.num_real_leaves)
        real = jnp.broadcast_to(real[:, None],
                                (np_, S, gpc)).reshape(P2, gpc)
        act = jnp.broadcast_to(pair_active[:, None], (np_, S)).reshape(P2)
        ghit = ghit & real & act[:, None]

        gm_ids = jnp.where(ghit, gid_rel, gpc)
        gm_ids = jnp.pad(gm_ids, ((0, 0), (0, gpc_pad - gpc)),
                         constant_values=gpc)
        gprefix, gtotal = compact_ascending_rows(gm_ids, gpc, K0,
                                                 interpret=interpret)
        gcand = gprefix[:, :k0] if k0 <= K0 else jnp.pad(
            gprefix, ((0, 0), (0, k0 - K0)), constant_values=gpc)

        # Leaf refine: attr-major leaf-box rows by GLOBAL group id.
        pair_c2 = jnp.broadcast_to(pair_c[:, None], (np_, S)).reshape(P2)
        safe_g = jnp.minimum(gcand, gpc - 1) + pair_c2[:, None] * gpc
        rows_lb = tables.leaf_boxes[safe_g]              # (P2, k0, lpg*6)
        att = [rows_lb[:, :, a * lpg:(a + 1) * lpg].reshape(P2, -1)
               for a in range(6)]
        member = (gcand[:, :, None] * lpg
                  + jnp.arange(lpg, dtype=jnp.int32)[None, None])
        member = member.reshape(P2, -1)                  # chunk-relative
        member_global = member + pair_c2[:, None] * lpc
        valid = (member < lpc) & (member_global < cull.num_real_leaves)
        lhit = _slab_hit_cols(po_lo, po_hi, pd_lo, pd_hi,
                              tuple(att[0:3]), tuple(att[3:6])) & valid

        K_l = min(member.shape[1], 8 * LANES)
        lm_ids = jnp.where(lhit, member, lpc)
        lprefix, ltotal = compact_ascending_rows(lm_ids, lpc, K_l,
                                                 interpret=interpret)

        j = jnp.arange(k, dtype=jnp.int32)
        lcnt = jnp.minimum(ltotal, K_l)[:, None]
        lhead = lprefix[:, :k] if K_l >= k else jnp.pad(
            lprefix, ((0, 0), (0, k - K_l)), constant_values=lpc)
        lvals = jnp.where(j[None, :] < jnp.minimum(lcnt, k), lhead, lpc)

        jg = jnp.arange(kg, dtype=jnp.int32)
        gcnt = gtotal[:, None]
        ghead = gprefix[:, :kg] if K0 >= kg else jnp.pad(
            gprefix, ((0, 0), (0, kg - K0)), constant_values=gpc)
        gvals = jnp.where(jg[None, :] < jnp.minimum(gcnt, kg), ghead, gpc)

        use_g = (ltotal[:, None] > k) | (gtotal[:, None] > k0) \
            | (ltotal[:, None] > K_l)
        ovf = jnp.any(use_g & (gtotal[:, None] > kg))

        pad = rowlen - 1 - max(k, kg)
        cnt_col = jnp.where(use_g, -jnp.minimum(gcnt, kg),
                            jnp.minimum(lcnt, k))
        body = jnp.where(use_g,
                         jnp.pad(gvals, ((0, 0), (0, max(k - kg, 0))),
                                 constant_values=gpc),
                         jnp.pad(lvals, ((0, 0), (0, max(kg - k, 0))),
                                 constant_values=lpc))
        rows = jnp.concatenate(
            [cnt_col, body, jnp.full((P2, pad), lpc, jnp.int32)], axis=1)
        return rows.reshape(np_, S, rowlen), ovf

    rows_b, ovf_b = jax.lax.map(one_block, (pc_b, pg_b, act_b))
    rows = rows_b.reshape(-1, S, rowlen)[:npairs]
    overflow = r_ovf | jnp.any(ovf_b)
    rows = rows.reshape(npairs, 1, S, rowlen)   # (Np, 1, S, rowlen): the
    # unit axis makes the per-step block shape identical to leafcull's
    # (1, 1, S, rowlen) SMEM candidate block.
    return rows, pair_c, pair_gb, merge_pos, overflow


def _routed_kernel(pair_c_ref, pair_gb_ref, cand_ref, rays_ref, entries_ref,
                   t_ref, slot_ref, *, subpackets: int, subpacket: int,
                   leaf_size: int, leaves_per_chunk: int,
                   leaves_per_group: int):
    """Grid (Npairs,). One step = one (chunk, g-block) pair: the resident
    chunk entries block against the g-block's S subpackets, exactly
    leafcull's per-step body with chunk_slot0 from the pair table."""
    p = pl.program_id(0)
    SP = subpacket
    ls = leaf_size
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    quarter = lane // ls
    lane_mod = lane % ls
    c = pair_c_ref[p]
    chunk_slot0 = c * leaves_per_chunk * ls

    ncs = [cand_ref[0, 0, s, 0] for s in range(subpackets)]
    any_work = ncs[0] != 0
    for s in range(1, subpackets):
        any_work = any_work | (ncs[s] != 0)

    @pl.when(jnp.logical_not(any_work))
    def _():
        t_ref[0, 0] = jnp.full((SP, subpackets), _BIG, jnp.float32)
        slot_ref[0, 0] = jnp.full((SP, subpackets), _NOSLOT, jnp.int32)

    @pl.when(any_work)
    def _():
        _leafcull_step(cand_ref, rays_ref, entries_ref, t_ref, slot_ref,
                       subpackets, subpacket, leaf_size, leaves_per_chunk,
                       leaves_per_group, quarter, lane_mod, chunk_slot0,
                       True)


@functools.partial(jax.jit, static_argnames=(
    "subpackets", "subpacket", "leaf_size", "leaves_per_chunk",
    "leaves_per_group", "interpret"))
def _routed_call(pair_c: Array, pair_gb: Array, cand: Array, feats: Array,
                 entries: Array, subpackets: int, subpacket: int,
                 leaf_size: int, leaves_per_chunk: int, leaves_per_group: int,
                 interpret: bool = False):
    npairs = cand.shape[0]
    S, SP = subpackets, subpacket
    rowlen = cand.shape[-1]
    kernel = functools.partial(
        _routed_kernel, subpackets=S, subpacket=SP, leaf_size=leaf_size,
        leaves_per_chunk=leaves_per_chunk, leaves_per_group=leaves_per_group)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(npairs,),
        in_specs=[
            pl.BlockSpec((1, 1, S, rowlen), lambda p, pc, pg: (p, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, SP, FEAT),
                         lambda p, pc, pg: (pg[p], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + entries.shape[1:],
                         lambda p, pc, pg: (pc[p], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, SP, S), lambda p, pc, pg: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SP, S), lambda p, pc, pg: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    t_p, slot_p = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((npairs, 1, SP, S), jnp.float32),
            jax.ShapeDtypeStruct((npairs, 1, SP, S), jnp.int32),
        ),
        interpret=interpret,
    )(pair_c, pair_gb, cand, feats, entries)
    return t_p[:, 0], slot_p[:, 0]


@functools.partial(jax.jit, static_argnames=(
    "max_groups", "max_candidates", "npairs", "kc", "pair_block",
    "interpret"))
def nearest_hit_tlas_feats(feats: Array, tables: ConeTables,
                           max_groups: int = 64, max_candidates: int = 119,
                           npairs: int = 8192, kc: int = 32,
                           pair_block: int = 8192,
                           interpret: bool = False):
    """Raw-order lite closest hit through the TLAS-routed pipeline.

    Same (t, slot, overflow) contract as conecull.nearest_hit_hybrid_feats
    (raw kernel order; index with kernel_order_dest). Works at any C but
    built for C >> 1; at C == 1 use the dense path (no routing needed).
    """
    cull = tables.cull
    g, S, SP, F = feats.shape
    npairs = min(npairs, cull.num_chunks * g)
    kc = min(kc, cull.num_chunks)

    rows, pair_c, pair_gb, merge_pos, overflow = tlas_candidates(
        feats, tables, max_groups, max_candidates, npairs, kc,
        pair_block=pair_block, interpret=interpret)
    t_p, slot_p = _routed_call(pair_c, pair_gb, rows, feats, cull.entries,
                               S, SP, cull.leaf_size, cull.leaves_per_chunk,
                               cull.leaves_per_group, interpret=interpret)

    # Merge: per g-block, gather its routed partial blocks and min-reduce.
    # Positions ascend in chunk order; argmin keeps the FIRST minimal t,
    # matching brute force's first-hit tie-break (chunks ascend in slot
    # order). Unused slots point at the sentinel row (all-miss).
    t_flat = jnp.concatenate(
        [t_p.reshape(npairs, SP * S),
         jnp.full((1, SP * S), _BIG, jnp.float32)], axis=0)
    s_flat = jnp.concatenate(
        [slot_p.reshape(npairs, SP * S),
         jnp.full((1, SP * S), _NOSLOT, jnp.int32)], axis=0)
    tm = t_flat[merge_pos]                                 # (g, Kc, SP*S)
    sm = s_flat[merge_pos]
    tmasked = jnp.where(sm < _NOSLOT, tm, _BIG)
    ci = jnp.argmin(tmasked, axis=1)[:, None]              # (g, 1, SP*S)
    t = jnp.take_along_axis(tmasked, ci, axis=1)[:, 0]
    slot = jnp.take_along_axis(sm, ci, axis=1)[:, 0]

    slot = slot.reshape(-1)
    t = t.reshape(-1)
    hit = slot < _NOSLOT
    return (jnp.where(hit, t, jnp.inf), jnp.where(hit, slot, -1), overflow)


@functools.partial(jax.jit, static_argnames=("row_block",))
def _tlas_merge(t_p: Array, slot_p: Array, merge_pos: Array,
                row_block: int = 64):
    """Per-g-block min-merge of routed partials (see nearest_hit_tlas_feats).

    Blocked over g rows: the gathered (g, kc, SP*S) temporaries are
    ~1.1 GB EACH at the 100M configuration (kc=512); lax.map over
    ``row_block`` g-rows keeps the peak ~g/row_block times smaller."""
    npairs, SP, S = t_p.shape
    g, kc = merge_pos.shape
    t_flat = jnp.concatenate(
        [t_p.reshape(npairs, SP * S),
         jnp.full((1, SP * S), _BIG, jnp.float32)], axis=0)
    s_flat = jnp.concatenate(
        [slot_p.reshape(npairs, SP * S),
         jnp.full((1, SP * S), _NOSLOT, jnp.int32)], axis=0)

    rb = min(row_block, g)
    pad = (-g) % rb
    mp = jnp.pad(merge_pos, ((0, pad), (0, 0)),
                 constant_values=npairs).reshape(-1, rb, kc)

    def one(mp_block):
        tm = t_flat[mp_block]                              # (rb, kc, SP*S)
        sm = s_flat[mp_block]
        tmasked = jnp.where(sm < _NOSLOT, tm, _BIG)
        ci = jnp.argmin(tmasked, axis=1)[:, None]
        t = jnp.take_along_axis(tmasked, ci, axis=1)[:, 0]
        slot = jnp.take_along_axis(sm, ci, axis=1)[:, 0]
        return t, slot

    t_b, s_b = jax.lax.map(one, mp)
    t = t_b.reshape(-1, SP * S)[:g].reshape(-1)
    slot = s_b.reshape(-1, SP * S)[:g].reshape(-1)
    hit = slot < _NOSLOT
    return jnp.where(hit, t, jnp.inf), jnp.where(hit, slot, -1)


def nearest_hit_tlas_split(feats: Array, tables: ConeTables,
                           max_groups: int = 64, max_candidates: int = 119,
                           npairs: int = 8192, kc: int = 32,
                           pair_block: int = 8192, interpret: bool = False):
    """The TLAS pipeline as FOUR separately-jitted programs.

    Same results as :func:`nearest_hit_tlas_feats` (one fused jit), but
    each stage (phase A, kernel, merge) compiles as its own program. At
    100M spheres the fused program crashed the remote compile helper
    (tpu_compile_helper exit 1 — a compiler-side resource failure, not a
    program error); splitting keeps each compilation small. Callers time
    the whole composite, so nothing is excluded from end-to-end numbers.
    """
    cull = tables.cull
    g, S, SP, F = feats.shape
    npairs = min(npairs, cull.num_chunks * g)
    kc = min(kc, cull.num_chunks)

    cand = jax.jit(tlas_candidates, static_argnames=(
        "max_groups", "max_candidates", "npairs", "kc", "pair_block",
        "interpret"))
    rows, pair_c, pair_gb, merge_pos, overflow = cand(
        feats, tables, max_groups, max_candidates, npairs, kc,
        pair_block=pair_block, interpret=interpret)

    # The kernel's scalar-prefetch pair tables live in SMEM; at ~78k pairs
    # (100M spheres) the two i32 arrays are ~620 KB and the compile helper
    # dies. Invoke the kernel over contiguous pair RANGES instead — each
    # range is still chunk-major, so entries-block residency is preserved;
    # outputs concatenate back into global pair order for the merge.
    KSPLIT = 24576
    nsplit = -(-npairs // KSPLIT)
    if nsplit <= 1:
        t_p, slot_p = _routed_call(pair_c, pair_gb, rows, feats,
                                   cull.entries, S, SP, cull.leaf_size,
                                   cull.leaves_per_chunk,
                                   cull.leaves_per_group,
                                   interpret=interpret)
    else:
        tps, sps = [], []
        for i in range(nsplit):
            lo = i * KSPLIT
            hi = min(npairs, lo + KSPLIT)
            tp, sp_ = _routed_call(
                pair_c[lo:hi], pair_gb[lo:hi], rows[lo:hi], feats,
                cull.entries, S, SP, cull.leaf_size,
                cull.leaves_per_chunk, cull.leaves_per_group,
                interpret=interpret)
            tps.append(tp)
            sps.append(sp_)
        t_p = jnp.concatenate(tps, axis=0)
        slot_p = jnp.concatenate(sps, axis=0)
    t, slot = _tlas_merge(t_p, slot_p, merge_pos)
    return t, slot, overflow
