"""Head-to-head kernel benchmark on the real chip.

Times every intersector generation on the reference benchmark distribution
(100k spheres r=0.5 in a 1000^3 world, origin rays; src/benchmark.c:283-332)
and prints a table + per-phase split for the cull kernels. This is the
evidence base for which path bench.py selects.

usage: python tools/headtohead.py [N_SPHERES] [B_RAYS]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tracer.core.types import Ray
from tracer.core.sort import sort_rays_by_direction, sort_rays_octahedral
from tracer.bvh.builder import build_bvh
from tracer.scene.scene import benchmark_scene

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 512 * 1024
WORLD = 1000.0


def timeit(fn, *args, n_calls=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n_calls):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_calls, out


def main():
    scene = benchmark_scene(jax.random.PRNGKey(1), N, world_size=WORLD)
    c = np.asarray(scene.centers)
    r = np.asarray(scene.radii)

    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(origin=jnp.zeros((B, 3), jnp.float32), direction=jnp.asarray(d))

    results = {}

    # ---- packet kernel (round-1) -------------------------------------
    t0 = time.time()
    bvh = build_bvh(c, r)
    print(f"build_bvh default leaf: {(time.time()-t0)*1000:.0f} ms, "
          f"nodes={bvh.num_nodes}", flush=True)
    rs, _ = sort_rays_by_direction(rays)
    rs = jax.block_until_ready(rs)
    try:
        from tracer.kernels import pack_bvh, nearest_hit_bvh_pallas
        packed = jax.jit(pack_bvh)(scene, bvh)
        fn = jax.jit(lambda rr: nearest_hit_bvh_pallas(rr, scene, packed).t)
        dt, out = timeit(fn, rs)
        results["packet"] = B / dt / 1e6
        print(f"packet:   {dt*1e3:8.2f} ms  {B/dt/1e6:8.2f} Mrays/s  "
              f"hits={int(np.isfinite(np.asarray(out)).sum())}", flush=True)
    except Exception as e:
        print(f"packet failed: {type(e).__name__}: {e}", flush=True)

    # ---- tilecull (round-2 gen 3) ------------------------------------
    try:
        from tracer.kernels.tilecull import (nearest_hit_tilecull)
        from tracer.intersect.cull import build_leaf_table
        table = build_leaf_table(bvh)
        ro, _ = sort_rays_octahedral(rays)
        ro = jax.block_until_ready(ro)
        for K in (64, 128):
            try:
                fn = jax.jit(lambda rr: nearest_hit_tilecull(
                    rr, scene, packed, table, max_candidates=K)[0].t)
                dt, out = timeit(fn, ro)
                _, ovf = nearest_hit_tilecull(ro, scene, packed, table,
                                              max_candidates=K)
                print(f"tilecull K={K}: {dt*1e3:8.2f} ms  "
                      f"{B/dt/1e6:8.2f} Mrays/s  overflow={bool(ovf)}",
                      flush=True)
                if not bool(ovf):
                    results[f"tilecull_k{K}"] = B / dt / 1e6
                    break
            except Exception as e:
                print(f"tilecull K={K} failed: {type(e).__name__}: {e}",
                      flush=True)
    except Exception as e:
        print(f"tilecull setup failed: {type(e).__name__}: {e}", flush=True)

    # ---- leafcull (round-2 gen 4) ------------------------------------
    try:
        from tracer.kernels.leafcull import (build_cull_tables,
                                             nearest_hit_leafcull,
                                             leaf_candidates,
                                             pack_ray_features)
        bvh32 = build_bvh(c, r, leaf_size=32)
        tables = build_cull_tables(scene, bvh32)
        print(f"leafcull tables: chunks={tables.num_chunks} "
              f"leaves={tables.num_leaves} groups={tables.num_groups} "
              f"entries={tables.entries.nbytes/1e6:.1f} MB", flush=True)
        ro, _ = sort_rays_octahedral(rays)
        ro = jax.block_until_ready(ro)
        for SP, K0, K in ((64, 48, 119), (128, 48, 119)):
            try:
                fn = jax.jit(lambda rr, sp=SP, k0=K0, k=K: nearest_hit_leafcull(
                    rr, scene, tables, max_groups=k0, max_candidates=k,
                    subpacket=sp)[0].t)
                dt, out = timeit(fn, ro)
                _, ovf = nearest_hit_leafcull(ro, scene, tables, max_groups=K0,
                                              max_candidates=K, subpacket=SP)
                name = f"leafcull_sp{SP}"
                print(f"{name}: {dt*1e3:8.2f} ms  {B/dt/1e6:8.2f} Mrays/s  "
                      f"overflow={bool(ovf)}  "
                      f"hits={int(np.isfinite(np.asarray(out)).sum())}",
                      flush=True)
                if not bool(ovf):
                    results[name] = B / dt / 1e6

                # phase split
                o = ro.origin
                dd = ro.direction
                feats, g, pad = pack_ray_features(o, dd, 8, SP)
                op = jnp.pad(o, ((0, pad), (0, 0)), mode="edge")
                dp = jnp.pad(dd, ((0, pad), (0, 0)), mode="edge")
                fA = jax.jit(lambda oo, ddd, sp=SP, k0=K0, k=K: leaf_candidates(
                    oo, ddd, tables, k0, k, sp)[0])
                dtA, rows = timeit(fA, op, dp)
                print(f"  phase A: {dtA*1e3:8.2f} ms "
                      f"(mean cand "
                      f"{float(np.asarray(rows)[..., 0].clip(0).mean()):.1f})",
                      flush=True)
            except Exception as e:
                import traceback; traceback.print_exc()
    except Exception as e:
        import traceback; traceback.print_exc()

    print("\nRESULTS (Mrays/s):")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"  {k:20s} {v:9.2f}  ({v/7.85:.2f}x baseline)")


if __name__ == "__main__":
    main()
