import sys, time
import numpy as np
import jax, jax.numpy as jnp
from tracer.bvh.builder import build_bvh
from tracer.scene.scene import benchmark_scene
from tracer.kernels.leafcull import (build_cull_tables, _interval_slab_hit_t,
                                     _compact_rows, subpacket_bounds,
                                     pack_ray_features)

N = 100_000; SP = 64
scene = benchmark_scene(jax.random.PRNGKey(1), N, world_size=1000.0)
c = np.asarray(scene.centers); r = np.asarray(scene.radii)
B = 512 * 1024
rng = np.random.default_rng(0)
d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
s_ = np.abs(d).sum(-1); u, v = d[:,0]/s_, d[:,1]/s_
neg = d[:,2]<0
uu = np.where(neg,(1-np.abs(v))*np.sign(u),u); vv = np.where(neg,(1-np.abs(u))*np.sign(v),v)
def part16(x):
    x = x.astype(np.uint64)&0xFFFF
    x=(x|(x<<8))&0x00FF00FF; x=(x|(x<<4))&0x0F0F0F0F; x=(x|(x<<2))&0x33333333; x=(x|(x<<1))&0x55555555
    return x
code = part16(np.clip((uu*.5+.5)*65535,0,65535).astype(np.uint64)) | (part16(np.clip((vv*.5+.5)*65535,0,65535).astype(np.uint64))<<1)
d = d[np.argsort(code, kind="stable")]
o = jnp.zeros((B,3), jnp.float32); dj = jnp.asarray(d)

bvh = build_bvh(c, r, leaf_size=32)
tables = jax.block_until_ready(build_cull_tables(scene, bvh))
lpg, lpc, C = tables.leaves_per_group, tables.leaves_per_chunk, tables.num_chunks
K0, K = 48, 124

def bench(name, f, *args):
    jf = jax.jit(f)
    out = jax.block_until_ready(jf(*args))
    t0=time.time(); n=10
    for _ in range(n): out = jf(*args)
    jax.block_until_ready(out); print(f"{name}: {(time.time()-t0)/n*1e3:7.2f} ms", flush=True)
    return out

bounds = bench("bounds", lambda o, dd: subpacket_bounds(o, dd, SP), o, dj)

ghit = bench("dense group hit", lambda b: _interval_slab_hit_t(
    *b, tables.group_min.T[:, None], tables.group_max.T[:, None]), bounds)

def stage3(ghit):
    gids = jnp.broadcast_to(jnp.arange(tables.num_groups, dtype=jnp.int32), ghit.shape)
    return _compact_rows(ghit, gids, K0, tables.num_groups, K0+5)[0]
grow = bench("group compact(sort)", stage3, ghit)

def stage4(grow, bounds):
    gcand = grow[:, 1:K0+1]
    P = gcand.shape[0]
    member = (gcand[:,:,None]*lpg + jnp.arange(lpg, dtype=jnp.int32)[None,None]).reshape(P,-1)
    valid = member < tables.num_leaves
    safe = jnp.where(valid, member, 0)
    lhit = _interval_slab_hit_t(*bounds, tables.leaf_min.T[:, safe], tables.leaf_max.T[:, safe]) & valid
    return lhit, safe
lhit, safe = bench("gather+leaf hit", stage4, grow, bounds)

def stage5(lhit, safe):
    chunk_of = safe // lpc
    rel = (safe - chunk_of*lpc).astype(jnp.int32)
    rows = []
    for cc in range(C):
        mc = lhit & (chunk_of == cc)
        rows.append(_compact_rows(mc, rel, K, lpc, 128)[0])
    return jnp.stack(rows, axis=1)
rows = bench("per-chunk compact", stage5, lhit, safe)

feats = bench("pack feats", lambda o, dd: pack_ray_features(o, dd, 8, SP)[0], o, dj)
