"""Benchmark entry point (run by the driver on real TPU hardware).

Measures the headline metric of BASELINE.md: closest-hit ray throughput with
the SAH BVH at n=100k spheres, on the reference's own benchmark distribution
(spheres r=0.5 uniform in a 1000^3 world, rays from the origin with uniform
cube directions; src/benchmark.c:172-223,283-332). The reference CPU achieves
7.85 Mrays/s at this size (results/benchmark_data.txt:3).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Timing amortizes the host<->device dispatch latency (large batches, several
chained calls, block once at the end) and excludes compilation.
"""

import json
import sys
import time

import numpy as np

BASELINE_MRAYS = 7.85  # reference BVH @ 100k spheres, results/benchmark_data.txt:3
N_SPHERES = 100_000
WORLD = 1000.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tracer.core.types import Ray
    from tracer.core.sort import sort_rays_by_direction
    from tracer.bvh.builder import build_bvh
    from tracer.scene.scene import benchmark_scene

    extras = {}

    scene = benchmark_scene(jax.random.PRNGKey(1), N_SPHERES, world_size=WORLD)
    c = np.asarray(scene.centers)
    r = np.asarray(scene.radii)

    t0 = time.time()
    bvh = build_bvh(c, r)
    build_ms = (time.time() - t0) * 1000.0
    extras["bvh_build_ms"] = round(build_ms, 1)
    log(f"BVH build: {build_ms:.0f} ms, nodes={bvh.num_nodes}")

    # Reference ray distribution: origin rays, uniform-cube directions
    # (src/benchmark.c:179-186), pre-sorted for packet coherence.
    rng = np.random.default_rng(0)
    from tracer.kernels.traverse_pallas import PACKET
    B = 512 * PACKET
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(origin=jnp.zeros((B, 3), jnp.float32), direction=jnp.asarray(d))
    rays_sorted, _ = sort_rays_by_direction(rays)
    rays_sorted = jax.block_until_ready(rays_sorted)

    value = None
    try:
        from tracer.kernels import pack_bvh, nearest_hit_bvh_pallas
        packed = jax.jit(pack_bvh)(scene, bvh)

        fn = jax.jit(lambda rr, p, s: nearest_hit_bvh_pallas(rr, s, p).t)
        out = jax.block_until_ready(fn(rays_sorted, packed, scene))
        hits = int(np.isfinite(np.asarray(out)).sum())
        log(f"pallas kernel warm; hit fraction {hits / B:.3f}")

        n_calls = 5
        t0 = time.time()
        for _ in range(n_calls):
            out = fn(rays_sorted, packed, scene)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / n_calls
        value = B / dt / 1e6
        extras["path"] = "pallas_packet_kernel"
        log(f"pallas: {dt * 1e3:.1f} ms/call -> {value:.1f} Mrays/s")
    except Exception as e:  # pragma: no cover - fallback path
        log(f"pallas path failed ({type(e).__name__}: {e}); "
            "falling back to pure-JAX traversal")
        from tracer.intersect.traverse import nearest_hit_bvh
        Bs = B // 8
        small = Ray(origin=rays_sorted.origin[:Bs],
                    direction=rays_sorted.direction[:Bs])
        fn = jax.jit(lambda rr, s, b: nearest_hit_bvh(rr, s, b).t)
        out = jax.block_until_ready(fn(small, scene, bvh))
        t0 = time.time()
        for _ in range(3):
            out = fn(small, scene, bvh)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 3
        value = Bs / dt / 1e6
        extras["path"] = "jnp_while_loop"

    print(json.dumps({
        "metric": "bvh_closest_hit_throughput_100k_spheres",
        "value": round(float(value), 2),
        "unit": "Mrays/s",
        "vs_baseline": round(float(value) / BASELINE_MRAYS, 2),
        **extras,
    }))


if __name__ == "__main__":
    main()
