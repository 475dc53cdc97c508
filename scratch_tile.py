"""tilecull: correctness vs brute (small) + perf sweep on chip.

usage: python scratch_tile.py check            # CPU/chip correctness
       python scratch_tile.py perf 16,32 32,64 [N] [S]
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from tracer.core.types import Ray
from tracer.core.sort import sort_rays_by_direction
from tracer.bvh.builder import build_bvh
from tracer.scene.scene import benchmark_scene
from tracer.kernels import pack_bvh
from tracer.kernels.tilecull import nearest_hit_tilecull, SUBPACKET
from tracer.intersect.cull import build_leaf_table
from tracer.intersect.brute import nearest_hit_brute

mode = sys.argv[1]

if mode == "check":
    N = 2000
    scene = benchmark_scene(jax.random.PRNGKey(1), N, world_size=80.0)
    c = np.asarray(scene.centers); r = np.asarray(scene.radii)
    B = 4096
    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-40, 40, (B, 3)).astype(np.float32) * (rng.random((B, 1)) < 0.5)
    rays = Ray(origin=jnp.asarray(o.astype(np.float32)), direction=jnp.asarray(d))
    rays_s, inv = sort_rays_by_direction(rays)

    bvh = build_bvh(c, r, leaf_size=16)
    packed = jax.jit(pack_bvh)(scene, bvh)
    table = build_leaf_table(bvh)

    interp = jax.default_backend() == "cpu"
    rec, ovf = nearest_hit_tilecull(rays_s, scene, packed, table,
                                    max_candidates=table.num_tiles,
                                    interpret=interp)
    ref = nearest_hit_brute(rays_s, scene)
    t_k = np.asarray(rec.t); t_b = np.asarray(ref.t)
    hit_k = np.isfinite(t_k); hit_b = np.isfinite(t_b)
    mism = (hit_k != hit_b).sum()
    both = hit_k & hit_b
    bad_t = (~np.isclose(t_k[both], t_b[both], rtol=2e-4)).sum()
    bad_i = (np.asarray(rec.index)[both] != np.asarray(ref.index)[both]).sum()
    print(f"overflow={bool(ovf)} hits={hit_b.sum()}/{B} "
          f"hitmask_mismatch={mism} t_mismatch={bad_t} idx_mismatch={bad_i}")
    assert mism == 0 and bad_t == 0, "MISMATCH"
    print("OK")

elif mode == "perf":
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 100_000
    S = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    scene = benchmark_scene(jax.random.PRNGKey(1), N, world_size=1000.0)
    c = np.asarray(scene.centers); r = np.asarray(scene.radii)
    B = 512 * 1024
    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(origin=jnp.zeros((B, 3), jnp.float32), direction=jnp.asarray(d))
    rays_s, _ = jax.block_until_ready(sort_rays_by_direction(rays))

    for leaf_size in [int(x) for x in sys.argv[2].split(",")]:
        t0 = time.time()
        bvh = build_bvh(c, r, leaf_size=leaf_size)
        print(f"build leaf={leaf_size}: {(time.time()-t0)*1e3:.0f} ms "
              f"nodes={bvh.num_nodes}", flush=True)
        packed = jax.jit(pack_bvh)(scene, bvh)
        table = build_leaf_table(bvh)
        packed, table = jax.block_until_ready((packed, table))

        from tracer.kernels.tilecull import subpacket_candidates
        capf = jax.jit(lambda o, dd: subpacket_candidates(
            o, dd, table, table.num_tiles, S)[0][..., 0])
        counts = np.asarray(capf(rays_s.origin, rays_s.direction)).ravel()
        print(f"  tiles={table.num_tiles} surv/subpacket: mean={counts.mean():.1f} "
              f"p50={np.percentile(counts,50):.0f} p95={np.percentile(counts,95):.0f} "
              f"max={counts.max()}", flush=True)

        for K in [int(x) for x in sys.argv[3].split(",")]:
            try:
                # phase A alone
                pa = jax.jit(lambda o, dd: subpacket_candidates(
                    o, dd, table, K, S)[0])
                cand = jax.block_until_ready(pa(rays_s.origin, rays_s.direction))
                t0 = time.time(); nrep = 5
                for _ in range(nrep):
                    cand = pa(rays_s.origin, rays_s.direction)
                jax.block_until_ready(cand)
                dt_a = (time.time() - t0) / nrep

                fn = jax.jit(lambda rr, p: nearest_hit_tilecull(
                    rr, scene, p, table, max_candidates=K, subpackets=S))
                rec, ovf = jax.block_until_ready(fn(rays_s, packed))
                t0 = time.time()
                for _ in range(nrep):
                    rec, ovf = fn(rays_s, packed)
                jax.block_until_ready(rec.t)
                dt = (time.time() - t0) / nrep
                hits = np.isfinite(np.asarray(rec.t)).mean()
                print(f"  K={K:4d}: {dt*1e3:7.2f} ms ({dt_a*1e3:6.2f} phA) "
                      f"{B/dt/1e6:7.1f} Mrays/s  "
                      f"overflow={bool(ovf)} hitfrac={hits:.3f}", flush=True)
            except Exception as e:
                print(f"  K={K}: FAIL {type(e).__name__}: {e}", flush=True)
