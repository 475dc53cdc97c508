"""Break down leafcull phase A / sort costs on real TPU hardware.

Usage: python tools/profile_phasea.py
Times each stage of tracer/kernels/leafcull.py leaf_candidates separately,
plus the ray argsort, to direct round-3 optimization.
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

from tracer.core.types import Ray
from tracer.bvh.builder import build_bvh
from tracer.scene.scene import benchmark_scene
from tracer.core.sort import (octahedral_codes, bucket_pad_sorted,
                              prep_rays_bucketed)
from tracer.core.types import Ray as _Ray
from tracer.kernels import leafcull as lc

N = 100_000
B = 512 * 1024
SP = 128
CELL_BITS = 8


def timeit(fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    scene = benchmark_scene(jax.random.PRNGKey(1), N, world_size=1000.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=32)
    tables = lc.build_cull_tables(scene, bvh)
    print(f"chunks={tables.num_chunks} leaves={tables.num_real_leaves} "
          f"groups={tables.num_groups}", file=sys.stderr)

    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((B, 3), jnp.float32)
    d = jnp.asarray(d)

    # --- sort pipeline breakdown ---
    f_codes = jax.jit(octahedral_codes)
    ms, codes = timeit(f_codes, d)
    print(f"codes:         {ms:7.2f} ms")
    f_argsort = jax.jit(jnp.argsort)
    ms, perm = timeit(f_argsort, codes)
    print(f"argsort:       {ms:7.2f} ms")
    f_gather = jax.jit(lambda o, d, p: (o[p], d[p]))
    ms, _ = timeit(f_gather, o, d, perm)
    print(f"perm gather:   {ms:7.2f} ms")
    f_bucket = jax.jit(lambda o, d, c: bucket_pad_sorted(o, d, c, SP,
                                                         cell_bits=CELL_BITS))
    sc = jnp.sort(codes)
    ms, (op, dp, dest) = timeit(f_bucket, o[perm], d[perm], sc)
    print(f"bucket_pad:    {ms:7.2f} ms")
    f_prep = jax.jit(lambda o, d: prep_rays_bucketed(
        _Ray(origin=o, direction=d), SP, cell_bits=CELL_BITS))
    ms, (pr, _) = timeit(f_prep, o, d)
    print(f"FUSED prep:    {ms:7.2f} ms")
    op, dp = pr.origin, pr.direction

    # --- phase A breakdown (on the padded sorted rays) ---
    max_groups, max_candidates = 48, 119
    k0 = min(max_groups, tables.num_groups)
    k = min(max_candidates, tables.leaves_per_chunk)
    rowlen = -(-(k + 9) // 128) * 128
    lpg = tables.leaves_per_group
    lpc = tables.leaves_per_chunk

    f_bounds = jax.jit(lambda o, d: lc.subpacket_bounds(o, d, SP))
    ms, bounds = timeit(f_bounds, op, dp)
    print(f"bounds:        {ms:7.2f} ms")
    o_lo, o_hi, d_lo, d_hi = bounds
    P = o_lo.shape[1]
    print(f"P={P} subpackets", file=sys.stderr)

    f_dense = jax.jit(lambda b0, b1, b2, b3: lc._interval_slab_hit_t(
        b0, b1, b2, b3, tables.group_min.T[:, None],
        tables.group_max.T[:, None]))
    ms, ghit = timeit(f_dense, *bounds)
    print(f"dense group:   {ms:7.2f} ms   ({ghit.shape})")

    real_group = (jnp.arange(tables.num_groups, dtype=jnp.int32) * lpg
                  < tables.num_real_leaves)
    ghit = ghit & real_group[None, :]
    gids = jnp.broadcast_to(jnp.arange(tables.num_groups, dtype=jnp.int32),
                            ghit.shape)
    f_gcomp = jax.jit(lambda gh: lc._compact_rows(gh, gids, k0,
                                                  tables.num_groups, k0 + 9))
    ms, (grow, gcounts) = timeit(f_gcomp, ghit)
    print(f"group compact: {ms:7.2f} ms")
    gcand = grow[:, 1:k0 + 1]
    print(f"mean groups/subpacket: {float(gcounts.mean()):.1f} "
          f"p95 {float(jnp.percentile(gcounts, 95)):.0f}", file=sys.stderr)

    f_gather2 = jax.jit(lambda g: tables.group_boxes[
        jnp.minimum(g, tables.num_groups - 1)])
    ms, boxes = timeit(f_gather2, gcand)
    print(f"box gather:    {ms:7.2f} ms   ({boxes.shape})")

    def refine(boxes, gcand, b0, b1, b2, b3):
        bt = boxes.reshape(P, k0 * lpg, 8).transpose(2, 0, 1)
        member = (gcand[:, :, None] * lpg
                  + jnp.arange(lpg, dtype=jnp.int32)[None, None]).reshape(P, -1)
        valid = member < tables.num_real_leaves
        return lc._interval_slab_hit_t(b0, b1, b2, b3, bt[0:3], bt[3:6]) & valid, member

    f_refine = jax.jit(refine)
    ms, (lhit, member) = timeit(f_refine, boxes, gcand, *bounds)
    print(f"refine slab:   {ms:7.2f} ms   ({lhit.shape})")

    counts = lhit.sum(-1)
    print(f"mean leaves/subpacket: {float(counts.mean()):.1f} "
          f"p95 {float(jnp.percentile(counts, 95)):.0f} "
          f"max {int(counts.max())}", file=sys.stderr)

    rel = (member % lpc).astype(jnp.int32)
    f_lcomp = jax.jit(lambda lh: lc._compact_rows(lh, rel, k, lpc, rowlen))
    ms, _ = timeit(f_lcomp, lhit)
    print(f"leaf compact:  {ms:7.2f} ms")

    # whole phase A as wired
    f_all = jax.jit(lambda o, d: lc.leaf_candidates(o, d, tables, max_groups,
                                                    max_candidates, SP))
    ms, (rows, ovf) = timeit(f_all, op, dp)
    print(f"TOTAL phase A: {ms:7.2f} ms  overflow={bool(ovf)}")

    # candidate stats from rows
    nc = rows[:, 0, 0]
    print(f"row counts: mean {float(jnp.abs(nc).mean()):.1f}", file=sys.stderr)


if __name__ == "__main__":
    main()
