"""Round-4 profiling: decompose prep + phase A + kernel on the real chip.

Usage: python tools/profile_r4.py
Prints per-stage fenced-slope timings so round-4 optimization targets the
real bottlenecks (VERDICT r3: the round is performance).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tracer.core.types import Ray
from tracer.bvh.builder import build_bvh
from tracer.scene.scene import benchmark_scene
from tracer.core.sort import (octahedral_codes, plan_bucket_pad, gather_rays,
                              prep_rays_bucketed)

N = 100_000
B = 512 * 1024
SP = 128


def fence(out):
    acc = jnp.float32(0)
    for x in jax.tree_util.tree_leaves(out):
        if hasattr(x, "ravel") and x.size:
            acc = acc + x.ravel()[0].astype(jnp.float32)
    return float(jax.device_get(acc))


def timeit(fn, *args, n1=2, n2=10, repeats=2):
    out = fn(*args)
    fence(out)

    def run(n):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        fence(outs)
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(repeats):
        best = min(best, (run(n2) - run(n1)) / (n2 - n1))
    return best * 1e3, out  # ms


def main():
    scene = benchmark_scene(jax.random.PRNGKey(1), N, world_size=1000.0)
    c = np.asarray(scene.centers)
    r = np.asarray(scene.radii)
    bvh = build_bvh(c, r, leaf_size=32)

    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((B, 3), jnp.float32)
    d = jnp.asarray(d)

    print("== prep decomposition ==")
    f_codes = jax.jit(lambda d: octahedral_codes(d))
    ms, codes = timeit(f_codes, d)
    print(f"octahedral_codes: {ms:.2f} ms")

    f_sortc = jax.jit(lambda c: jnp.sort(c))
    ms, _ = timeit(f_sortc, codes)
    print(f"jnp.sort(codes) [keys only]: {ms:.2f} ms")

    f_arg = jax.jit(lambda c: jnp.argsort(c))
    ms, perm = timeit(f_arg, codes)
    print(f"jnp.argsort(codes): {ms:.2f} ms")

    sc = jnp.sort(codes)
    f_plan = jax.jit(lambda sc: plan_bucket_pad(sc, SP, cell_bits=8))
    ms, (src, dest) = timeit(f_plan, sc)
    print(f"plan_bucket_pad: {ms:.2f} ms")

    f_gather = jax.jit(lambda o, d, idx: gather_rays(o, d, idx))
    ms, _ = timeit(f_gather, o, d, perm)
    print(f"gather_rays (one (B,8) row gather): {ms:.2f} ms")

    f_scatter = jax.jit(
        lambda dest, perm: jnp.zeros_like(dest).at[perm].set(dest))
    ms, _ = timeit(f_scatter, dest, perm)
    print(f"dest scatter (inverse perm): {ms:.2f} ms")

    f_prep = jax.jit(lambda o, d: prep_rays_bucketed(
        Ray(origin=o, direction=d), SP, cell_bits=8))
    ms, (rays, dest2) = timeit(f_prep, o, d)
    print(f"prep_rays_bucketed TOTAL: {ms:.2f} ms")

    # 10-bit cells
    f_prep10 = jax.jit(lambda o, d: prep_rays_bucketed(
        Ray(origin=o, direction=d), SP, cell_bits=10))
    ms, _ = timeit(f_prep10, o, d)
    print(f"prep_rays_bucketed cell_bits=10: {ms:.2f} ms")

    # == phase A decomposition ==
    print("== phase A ==")
    from tracer.kernels.leafcull import (build_cull_tables, leaf_candidates,
                                         subpacket_bounds,
                                         _interval_slab_hit_t, _compact_rows,
                                         pack_ray_features, _leafcull_call)

    tables = build_cull_tables(scene, bvh)
    print(f"tables: chunks={tables.num_chunks} leaves={tables.num_leaves} "
          f"groups={tables.num_groups} entries={tables.entries.nbytes/1e6:.1f}MB")

    op, dp = rays.origin, rays.direction
    feats, g, pad = pack_ray_features(op, dp, 8, SP)
    o2 = jnp.pad(op, ((0, pad), (0, 0)), mode="edge")
    d2 = jnp.pad(dp, ((0, pad), (0, 0)), mode="edge")

    ms, _ = timeit(jax.jit(lambda o, d: pack_ray_features(o, d, 8, SP)[0]),
                   op, dp)
    print(f"pack_ray_features: {ms:.2f} ms")

    f_bounds = jax.jit(lambda o, d: subpacket_bounds(o, d, SP))
    ms, bounds = timeit(f_bounds, o2, d2)
    print(f"subpacket_bounds: {ms:.2f} ms")

    o_lo, o_hi, d_lo, d_hi = bounds

    def dense(o_lo, o_hi, d_lo, d_hi):
        ghit = _interval_slab_hit_t(o_lo, o_hi, d_lo, d_hi,
                                    tables.group_min.T[:, None],
                                    tables.group_max.T[:, None])
        return ghit

    ms, ghit = timeit(jax.jit(dense), o_lo, o_hi, d_lo, d_hi)
    print(f"dense group slab test (P x {tables.num_groups}): {ms:.2f} ms")
    gmean = float(jnp.mean(jnp.sum(ghit, axis=1)))
    print(f"  mean surviving groups/subpacket: {gmean:.1f}")

    def compact(ghit):
        gids = jnp.broadcast_to(
            jnp.arange(tables.num_groups, dtype=jnp.int32), ghit.shape)
        return _compact_rows(ghit, gids, 48, tables.num_groups, 48 + 9)

    ms, (grow, gcounts) = timeit(jax.jit(compact), ghit)
    print(f"group compact sort (P x {tables.num_groups}): {ms:.2f} ms")

    gcand = grow[:, 1:49]

    def refine(gcand, o_lo, o_hi, d_lo, d_hi):
        P = gcand.shape[0]
        lpg = tables.leaves_per_group
        safe_g = jnp.minimum(gcand, tables.num_groups - 1)
        boxes = tables.group_boxes[safe_g]
        boxes = boxes.reshape(P, 48 * lpg, 8)
        bt = boxes.transpose(2, 0, 1)
        member = (gcand[:, :, None] * lpg
                  + jnp.arange(lpg, dtype=jnp.int32)[None, None])
        member = member.reshape(P, -1)
        valid = member < tables.num_real_leaves
        lhit = _interval_slab_hit_t(o_lo, o_hi, d_lo, d_hi,
                                    bt[0:3], bt[3:6]) & valid
        return lhit, member

    ms, (lhit, member) = timeit(jax.jit(refine), gcand, o_lo, o_hi, d_lo,
                                d_hi)
    print(f"refine (gather boxes + slab, P x 768): {ms:.2f} ms")
    lmean = float(jnp.mean(jnp.sum(lhit, axis=1)))
    print(f"  mean surviving leaves/subpacket: {lmean:.1f}")

    ms, (rows, ovf) = timeit(
        jax.jit(lambda o, d: leaf_candidates(o, d, tables, 48, 119, SP)),
        o2, d2)
    print(f"leaf_candidates TOTAL: {ms:.2f} ms (overflow={bool(ovf)})")

    # kernel
    rowsk = rows.reshape(tables.num_chunks, g, 8, rows.shape[-1])
    rowsk, feats = jax.block_until_ready((rowsk, feats))
    fB = lambda f, rr: _leafcull_call(
        f, rr, tables.entries, 8, SP, tables.leaf_size,
        tables.leaves_per_chunk, tables.leaves_per_group)
    ms, _ = timeit(fB, feats, rowsk)
    print(f"kernel (phase B): {ms:.2f} ms")

    # stats: candidate leaves histogram
    cnt = np.asarray(rows[0, :, 0])
    cnt = np.where(cnt < 0, -cnt * 16, cnt)
    print(f"candidate leaves/subpacket: mean={cnt.mean():.1f} "
          f"p50={np.percentile(cnt,50):.0f} p95={np.percentile(cnt,95):.0f} "
          f"max={cnt.max()}")


if __name__ == "__main__":
    main()
