"""Head-to-head: conecull (r4) vs leafcull (r3) on the benchmark config."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tracer.core.types import Ray
from tracer.bvh.builder import build_bvh
from tracer.scene.scene import benchmark_scene
from tracer.core.sort import prep_rays_bucketed

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
B = 512 * 1024
SP = 128
CELL_BITS = 8


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
    return best * 1e3, out


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

    prep = jax.jit(lambda o, d: prep_rays_bucketed(
        Ray(origin=o, direction=d), SP, cell_bits=CELL_BITS))
    ms_prep, (rays, dest) = timeit(prep, o, d)
    print(f"prep: {ms_prep:.2f} ms")

    # --- conecull ---
    from tracer.kernels.conecull import (build_cone_tables, cone_candidates,
                                         nearest_hit_conecull_t,
                                         _conecull_call, CONE_FEAT)
    from tracer.kernels.leafcull import pack_ray_features

    tables = build_cone_tables(scene, bvh)
    cull = tables.cull
    print(f"tables: chunks={cull.num_chunks} leaves={cull.num_real_leaves} "
          f"groups={cull.num_groups}")

    fn = jax.jit(lambda rr: nearest_hit_conecull_t(
        rr, tables, max_groups=64, max_candidates=119,
        subpackets=8, subpacket=SP)[0])
    ms, t = timeit(fn, rays)
    _, _, ovf = nearest_hit_conecull_t(rays, tables, max_groups=64,
                                       max_candidates=119, subpackets=8,
                                       subpacket=SP)
    hits = int(np.isfinite(np.asarray(t)[np.asarray(dest)]).sum())
    print(f"conecull e2e(sans prep): {ms:.2f} ms -> {B/ms/1e3:.1f} Mrays/s "
          f"(hits {hits/B:.4f}, overflow={bool(ovf)})")
    full = (ms + ms_prep)
    print(f"conecull honest (incl prep): {full:.2f} ms -> "
          f"{B/full/1e3:.1f} Mrays/s")

    # phase split
    S = 8
    feats, g, pad = pack_ray_features(rays.origin, rays.direction, S, SP)
    fA = jax.jit(lambda f: cone_candidates(f, tables, 64, 119)[:2])
    msA, (rows, cones) = timeit(fA, feats)
    rowsk = rows.reshape(cull.num_chunks, g, S, rows.shape[-1])
    conesk = cones.reshape(g, 1, S, CONE_FEAT)
    rowsk, conesk, feats = jax.block_until_ready((rowsk, conesk, feats))
    fB = lambda f, rr, cc: _conecull_call(
        f, rr, cc, cull.entries, S, SP, cull.leaf_size,
        cull.leaves_per_chunk, cull.leaves_per_group)
    msB, _ = timeit(fB, feats, rowsk, conesk)
    print(f"phase A (cone): {msA:.2f} ms, kernel: {msB:.2f} ms")

    cnt = np.asarray(rows[:, :, 0].transpose(1, 0))  # (P, C) from (C, P)
    lpg = cull.leaves_per_group
    cl = np.where(cnt < 0, -cnt * lpg, cnt).sum(1)
    print(f"cand leaves/subpacket: mean={cl.mean():.1f} "
          f"p50={np.percentile(cl,50):.0f} p95={np.percentile(cl,95):.0f} "
          f"max={cl.max()} groupmode_frac={(cnt<0).mean():.4f}")

    # --- leafcull baseline ---
    from tracer.kernels.leafcull import (build_cull_tables,
                                         nearest_hit_leafcull_t)
    fn2 = jax.jit(lambda rr: nearest_hit_leafcull_t(
        rr, cull, max_groups=48, max_candidates=119,
        subpackets=8, subpacket=SP)[0])
    ms2, t2 = timeit(fn2, rays)
    print(f"leafcull e2e(sans prep): {ms2:.2f} ms -> {B/ms2/1e3:.1f} Mrays/s")

    # result agreement
    agree = float(np.mean(np.isclose(np.asarray(t), np.asarray(t2),
                                     rtol=1e-4, atol=1e-4) |
                          (~np.isfinite(np.asarray(t))
                           & ~np.isfinite(np.asarray(t2)))))
    print(f"t agreement conecull vs leafcull: {agree:.6f}")


def bench_hybrid():
    """Hybrid path: cone_candidates phase A + 16-wide leafcull kernel."""
    import jax, jax.numpy as jnp
    scene = benchmark_scene(jax.random.PRNGKey(1), N, world_size=WORLD if 'WORLD' in globals() else 1000.0)
    c = np.asarray(scene.centers); r = np.asarray(scene.radii)
    bvh = build_bvh(c, r, leaf_size=32)
    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((B, 3), jnp.float32); d = jnp.asarray(d)
    prep = jax.jit(lambda o, d: prep_rays_bucketed(
        Ray(origin=o, direction=d), SP, cell_bits=CELL_BITS))
    ms_prep, (rays, dest) = timeit(prep, o, d)
    from tracer.kernels.conecull import build_cone_tables, nearest_hit_hybrid_t
    tables = build_cone_tables(scene, bvh)
    for mg in (64, 96, 128):
        fn = jax.jit(lambda rr, mg=mg: nearest_hit_hybrid_t(
            rr, tables, max_groups=mg, max_candidates=119,
            subpackets=8, subpacket=SP)[0])
        ms, t = timeit(fn, rays)
        full = ms + ms_prep
        print(f"hybrid mg={mg}: {ms:.2f} ms ({B/ms/1e3:.1f} Mrays/s) | "
              f"honest {full:.2f} ms ({B/full/1e3:.1f} Mrays/s)", flush=True)





def bench_raw():
    """Raw-order honest pipeline: prep(+dest remap) + phase A + kernel16."""
    import jax, jax.numpy as jnp
    from tracer.kernels.conecull import (build_cone_tables,
                                         nearest_hit_hybrid_raw,
                                         kernel_order_dest)
    scene = benchmark_scene(jax.random.PRNGKey(1), N, world_size=1000.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=32)
    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((B, 3), jnp.float32); d = jnp.asarray(d)
    tables = build_cone_tables(scene, bvh)

    def prep(o, d):
        rays, dest = prep_rays_bucketed(Ray(origin=o, direction=d), SP,
                                        cell_bits=CELL_BITS)
        return rays, kernel_order_dest(dest, 8, SP)
    prepj = jax.jit(prep)
    msp, (rays, dest2) = timeit(prepj, o, d)
    print(f"prep(+dest remap): {msp:.2f} ms", flush=True)

    for mg in (64, 96):
        fn = jax.jit(lambda rr, mg=mg: nearest_hit_hybrid_raw(
            rr, tables, max_groups=mg, max_candidates=119,
            subpackets=8, subpacket=SP)[0])
        ms, t = timeit(fn, rays)
        hits = int(np.isfinite(np.asarray(t)[np.asarray(dest2)]).sum())
        full = ms + msp
        print(f"raw mg={mg}: query {ms:.2f} ms ({B/ms/1e3:.1f} Mrays/s) | "
              f"honest {full:.2f} ms ({B/full/1e3:.1f} Mrays/s) "
              f"hits={hits/B:.4f}", flush=True)

    # one fused jit: prep + query together
    def oneshot(o, d):
        rays, dest2 = prep(o, d)
        t, slot, ovf = nearest_hit_hybrid_raw(rays, tables, max_groups=64,
                                              max_candidates=119,
                                              subpackets=8, subpacket=SP)
        return t, dest2
    fos = jax.jit(oneshot)
    ms, _ = timeit(fos, o, d)
    print(f"oneshot fused: {ms:.2f} ms ({B/ms/1e3:.1f} Mrays/s)", flush=True)


if __name__ == "__main__":
    mode = sys.argv[2] if len(sys.argv) > 2 else "main"
    {"hybrid": bench_hybrid, "raw": bench_raw}.get(mode, main)()
