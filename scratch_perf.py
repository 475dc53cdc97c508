"""Perf experiment: n_streams x leaf_size sweep on the real chip."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from tracer.core.types import Ray
from tracer.core.sort import sort_rays_by_direction
from tracer.bvh.builder import build_bvh
from tracer.scene.scene import benchmark_scene
from tracer.kernels import pack_bvh, nearest_hit_bvh_pallas
from tracer.kernels.traverse_pallas import PACKET

N = 100_000
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
    bvh = build_bvh(c, r, leaf_size=leaf_size)
    packed = jax.jit(pack_bvh)(scene, bvh)
    packed = jax.block_until_ready(packed)
    for ns in [int(x) for x in sys.argv[2].split(",")]:
        try:
            fn = jax.jit(lambda rr, p: nearest_hit_bvh_pallas(
                rr, scene, p, with_steps=True, n_streams=ns))
            rec, steps = jax.block_until_ready(fn(rays_sorted, packed))
            t0 = time.time()
            for _ in range(5):
                rec, steps = fn(rays_sorted, packed)
            jax.block_until_ready(rec.t)
            dt = (time.time() - t0) / 5
            st = np.asarray(steps).reshape(-1, PACKET)[:, 0]
            print(f"leaf={leaf_size:4d} ns={ns:2d}: {dt*1e3:7.2f} ms  "
                  f"{B/dt/1e6:7.1f} Mrays/s  steps/packet mean={st.mean():.0f} "
                  f"max={st.max()} nodes={bvh.num_nodes}", flush=True)
        except Exception as e:
            print(f"leaf={leaf_size} ns={ns}: FAIL {type(e).__name__}: {e}",
                  flush=True)
