"""Perf experiment: cull path (phase A+B) sweep on the real chip.

usage: python scratch_cull.py 16,32 64,128  (leaf_sizes, K budgets)
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from tracer.core.types import Ray
from tracer.core.sort import sort_rays_by_direction
from tracer.bvh.builder import build_bvh
from tracer.scene.scene import benchmark_scene
from tracer.kernels import pack_bvh
from tracer.kernels.cull_pallas import nearest_hit_cull
from tracer.intersect.cull import build_leaf_table, tile_candidates, packet_bounds
from tracer.kernels.traverse_pallas import PACKET

N = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
scene = benchmark_scene(jax.random.PRNGKey(1), N, world_size=1000.0)
c = np.asarray(scene.centers); r = np.asarray(scene.radii)

B = 512 * PACKET
rng = np.random.default_rng(0)
d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rays = Ray(origin=jnp.zeros((B, 3), jnp.float32), direction=jnp.asarray(d))
rays_sorted, _ = sort_rays_by_direction(rays)
rays_sorted = jax.block_until_ready(rays_sorted)

for leaf_size in [int(x) for x in sys.argv[1].split(",")]:
    t0 = time.time()
    bvh = build_bvh(c, r, leaf_size=leaf_size)
    print(f"build leaf={leaf_size}: {(time.time()-t0)*1e3:.0f} ms "
          f"nodes={bvh.num_nodes}", flush=True)
    packed = jax.jit(pack_bvh)(scene, bvh)
    table = build_leaf_table(bvh)
    packed, table = jax.block_until_ready((packed, table))
    print(f"  tiles={table.num_tiles}", flush=True)

    # survivor-count stats (phase A only)
    capf = jax.jit(lambda o, dd: tile_candidates(o, dd, table, table.num_tiles)[1])
    counts = np.asarray(capf(rays_sorted.origin, rays_sorted.direction)).ravel()
    print(f"  survivors/packet: mean={counts.mean():.1f} p50={np.percentile(counts,50):.0f} "
          f"p95={np.percentile(counts,95):.0f} max={counts.max()}", flush=True)

    for K in [int(x) for x in sys.argv[2].split(",")]:
        try:
            fn = jax.jit(lambda rr, p: nearest_hit_cull(
                rr, scene, p, table, max_candidates=K))
            (rec, ovf) = jax.block_until_ready(fn(rays_sorted, packed))
            t0 = time.time()
            nrep = 5
            for _ in range(nrep):
                rec, ovf = fn(rays_sorted, packed)
            jax.block_until_ready(rec.t)
            dt = (time.time() - t0) / nrep
            print(f"  K={K:4d}: {dt*1e3:7.2f} ms  {B/dt/1e6:7.1f} Mrays/s  "
                  f"overflow={bool(ovf)}", flush=True)
        except Exception as e:
            print(f"  K={K}: FAIL {type(e).__name__}: {e}", flush=True)
