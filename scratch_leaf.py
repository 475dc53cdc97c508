"""leafcull: correctness vs brute (CPU interpret) + perf sweep on chip.

usage: python scratch_leaf.py check
       python scratch_leaf.py perf [N] [SP] [S]
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from tracer.core.types import Ray
from tracer.bvh.builder import build_bvh
from tracer.scene.scene import benchmark_scene
from tracer.kernels.leafcull import (build_cull_tables, nearest_hit_leafcull,
                                     nearest_hit_leafcull_checked)
from tracer.intersect.brute import nearest_hit_brute

def oct_codes(d):
    def part16(v):
        v = v.astype(np.uint64) & 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v
    s = np.abs(d).sum(-1)
    u, v = d[:,0]/s, d[:,1]/s
    neg = d[:,2] < 0
    uu = np.where(neg, (1-np.abs(v))*np.sign(u), u)
    vv = np.where(neg, (1-np.abs(u))*np.sign(v), v)
    qu = np.clip(((uu*0.5+0.5)*65535), 0, 65535).astype(np.uint64)
    qv = np.clip(((vv*0.5+0.5)*65535), 0, 65535).astype(np.uint64)
    return part16(qu) | (part16(qv) << 1)

mode = sys.argv[1]

if mode == "check":
    import os
    interp = jax.default_backend() == "cpu"
    N = 3000
    scene = benchmark_scene(jax.random.PRNGKey(1), N, world_size=90.0)
    c = np.asarray(scene.centers); r = np.asarray(scene.radii)
    B = 4096
    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-45, 45, (B, 3)).astype(np.float32) * (rng.random((B, 1)) < 0.5)
    perm = np.argsort(oct_codes(d), kind="stable")
    o, d = o[perm], d[perm]
    rays = Ray(origin=jnp.asarray(o), direction=jnp.asarray(d))

    bvh = build_bvh(c, r, leaf_size=32)
    for chunk_mb in (9, 0.2):   # single-chunk and multi-chunk
        tables = build_cull_tables(scene, bvh, max_chunk_bytes=int(chunk_mb*(1<<20)))
        rec = nearest_hit_leafcull_checked(rays, scene, tables,
                                           subpacket=64, interpret=interp)
        ref = nearest_hit_brute(rays, scene)
        t_k = np.asarray(rec.t); t_b = np.asarray(ref.t)
        hit_k = np.isfinite(t_k); hit_b = np.isfinite(t_b)
        mism = (hit_k != hit_b).sum()
        both = hit_k & hit_b
        bad_t = (~np.isclose(t_k[both], t_b[both], rtol=2e-4)).sum()
        bad_i = (np.asarray(rec.index)[both] != np.asarray(ref.index)[both]).sum()
        print(f"chunks={tables.num_chunks}: hits={hit_b.sum()}/{B} "
              f"hitmask_mismatch={mism} t_mismatch={bad_t} idx_mismatch={bad_i}")
        assert mism == 0 and bad_t == 0, "MISMATCH"
    print("OK")

elif mode == "perf":
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    SP = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    S = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    scene = benchmark_scene(jax.random.PRNGKey(1), N, world_size=1000.0)
    c = np.asarray(scene.centers); r = np.asarray(scene.radii)
    B = 512 * 1024
    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    perm = np.argsort(oct_codes(d), kind="stable")
    d = d[perm]
    rays = Ray(origin=jnp.zeros((B, 3), jnp.float32), direction=jnp.asarray(d))
    rays = jax.block_until_ready(rays)

    t0 = time.time()
    bvh = build_bvh(c, r, leaf_size=32)
    print(f"build: {(time.time()-t0)*1e3:.0f} ms nodes={bvh.num_nodes}", flush=True)
    tables = jax.block_until_ready(build_cull_tables(scene, bvh))
    print(f"tables: chunks={tables.num_chunks} L={tables.num_leaves} "
          f"entries={tables.entries.nbytes/2**20:.1f} MB", flush=True)

    from tracer.kernels.leafcull import leaf_candidates, pack_ray_features
    for (K0, K) in ((48, 124), (64, 252)):
        try:
            pa = jax.jit(lambda o, dd: leaf_candidates(o, dd, tables, K0, K, SP))
            rows, ovf = jax.block_until_ready(pa(rays.origin, rays.direction))
            t0 = time.time(); nrep = 5
            for _ in range(nrep):
                rows, ovf = pa(rays.origin, rays.direction)
            jax.block_until_ready(rows)
            dt_a = (time.time() - t0) / nrep
            counts = np.asarray(rows[..., 0]).sum(-1)
            fn = jax.jit(lambda rr: nearest_hit_leafcull(
                rr, scene, tables, max_groups=K0, max_candidates=K,
                subpackets=S, subpacket=SP))
            rec, ovf2 = jax.block_until_ready(fn(rays))
            t0 = time.time()
            for _ in range(nrep):
                rec, ovf2 = fn(rays)
            jax.block_until_ready(rec.t)
            dt = (time.time() - t0) / nrep
            hits = np.isfinite(np.asarray(rec.t)).mean()
            print(f"K0={K0} K={K}: {dt*1e3:7.2f} ms ({dt_a*1e3:6.2f} phA) "
                  f"{B/dt/1e6:7.1f} Mrays/s overflow={bool(ovf2)} "
                  f"hitfrac={hits:.3f} leaves/spkt mean={counts.mean():.0f}",
                  flush=True)
        except Exception as e:
            import traceback; traceback.print_exc()
            print(f"K0={K0} K={K}: FAIL {type(e).__name__}", flush=True)
