"""Chip microbench: phase A cost breakdown + compaction variants + kernel."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from tracer.core.types import Ray
from tracer.core.sort import sort_rays_by_direction
from tracer.bvh.builder import build_bvh
from tracer.scene.scene import benchmark_scene
from tracer.kernels import pack_bvh
from tracer.intersect.cull import build_leaf_table, packet_leaf_hit
from tracer.kernels.tilecull import nearest_hit_tilecull, SUBPACKET

def bench(name, fn, *args, nrep=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(nrep):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/nrep*1e3:8.2f} ms", flush=True)
    return out

N = 100_000
scene = benchmark_scene(jax.random.PRNGKey(1), N, world_size=1000.0)
c = np.asarray(scene.centers); r = np.asarray(scene.radii)
B = 512 * 1024
rng = np.random.default_rng(0)
d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rays = Ray(origin=jnp.zeros((B, 3), jnp.float32), direction=jnp.asarray(d))
rays_s, _ = jax.block_until_ready(sort_rays_by_direction(rays))
bvh = build_bvh(c, r, leaf_size=16)
packed = jax.jit(pack_bvh)(scene, bvh)
table = build_leaf_table(bvh)
T = table.num_tiles
lpt = 128 // table.leaf_size
print("tiles", T, "leaves", table.leaf_min.shape[0], flush=True)

o = rays_s.origin; dd = rays_s.direction
P = B // SUBPACKET

@jax.jit
def hits_only(o, dd):
    op = o.reshape(-1, SUBPACKET, 3); dp = dd.reshape(-1, SUBPACKET, 3)
    return packet_leaf_hit(op.min(1), op.max(1), dp.min(1), dp.max(1), table)

hit = bench("A1 slab tests (P,L)", hits_only, o, dd)

@jax.jit
def tilehit(o, dd):
    h = hits_only(o, dd)
    return h.reshape(h.shape[0], T, lpt).any(-1)

th = bench("A2 +tile any", tilehit, o, dd)
lv = np.asarray(jnp.sum(hit, axis=-1))
tv = np.asarray(jnp.sum(th, axis=-1))
print(f"surv leaves/subpacket mean={lv.mean():.1f} p50={np.percentile(lv,50):.0f} "
      f"p95={np.percentile(lv,95):.0f}; tiles mean={tv.mean():.1f}", flush=True)

K = 64
@jax.jit
def comp_scatter(o, dd):
    thh = tilehit(o, dd)
    pos = jnp.cumsum(thh, axis=-1, dtype=jnp.int32)
    slot = jnp.minimum(jnp.where(thh, pos - 1, K), K)
    tid = jnp.arange(T, dtype=jnp.int32)
    cand = jnp.full((thh.shape[0], K + 1), T, jnp.int32)
    return cand.at[jnp.arange(thh.shape[0])[:, None], slot].min(
        jnp.broadcast_to(tid, thh.shape))[:, :K]

bench("A3 compaction scatter-min", comp_scatter, o, dd)

@jax.jit
def comp_topk(o, dd):
    thh = tilehit(o, dd)
    tid = jnp.arange(T, dtype=jnp.int32)
    score = jnp.where(thh, T - tid, 0)
    vals, idx = jax.lax.top_k(score, K)
    return jnp.where(vals > 0, idx, T).astype(jnp.int32)

bench("A3 compaction top_k", comp_topk, o, dd)

@jax.jit
def comp_sort(o, dd):
    thh = tilehit(o, dd)
    tid = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), thh.shape)
    key = jnp.where(thh, tid, T)
    skey = jax.lax.sort(key, dimension=-1)
    return skey[:, :K]

bench("A3 compaction sort", comp_sort, o, dd)

# end-to-end with current (scatter) phase A
fn = jax.jit(lambda rr, p: nearest_hit_tilecull(
    rr, scene, p, table, max_candidates=K, subpackets=8))
rec, ovf = bench("E2E tilecull K=64", fn, rays_s, packed)
print("hitfrac", float(np.isfinite(np.asarray(rec.t)).mean()), flush=True)
