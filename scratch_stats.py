import numpy as np, jax, jax.numpy as jnp
from tracer.core.types import Ray
from tracer.core.sort import sort_rays_by_direction
from tracer.bvh.builder import build_bvh
from tracer.scene.scene import benchmark_scene
from tracer.intersect.cull import build_leaf_table, packet_leaf_hit

N = 100_000
scene = benchmark_scene(jax.random.PRNGKey(1), N, world_size=1000.0)
c = np.asarray(scene.centers); r = np.asarray(scene.radii)
B = 512 * 1024
rng = np.random.default_rng(0)
d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)

def part16(v):
    v = v.astype(np.uint64) & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v

def oct_sort(d):
    ax, ay, az = np.abs(d[:,0]), np.abs(d[:,1]), np.abs(d[:,2])
    s = ax + ay + az
    u, v = d[:,0]/s, d[:,1]/s
    neg = d[:,2] < 0
    uu = np.where(neg, (1-np.abs(v))*np.sign(u), u)
    vv = np.where(neg, (1-np.abs(u))*np.sign(v), v)
    qu = np.clip(((uu*0.5+0.5)*65535), 0, 65535).astype(np.uint64)
    qv = np.clip(((vv*0.5+0.5)*65535), 0, 65535).astype(np.uint64)
    code = part16(qu) | (part16(qv) << 1)
    return np.argsort(code, kind="stable")

bvh = build_bvh(c, r, leaf_size=16)
table = build_leaf_table(bvh)

for name, perm in (("3dmorton", None), ("octahedral", oct_sort(d))):
    if perm is None:
        rays_s, _ = sort_rays_by_direction(Ray(origin=jnp.zeros((B,3),jnp.float32), direction=jnp.asarray(d)))
        ds = np.asarray(rays_s.direction)
    else:
        ds = d[perm]
    for SP in (32, 64, 128):
        o = jnp.zeros((B//SP, SP, 3), jnp.float32); dd = jnp.asarray(ds).reshape(-1, SP, 3)
        f = jax.jit(lambda o, dd: packet_leaf_hit(o.min(1), o.max(1), dd.min(1), dd.max(1), table).sum(-1))
        counts = np.asarray(f(o, dd))
        print(f"{name} SP={SP}: leaves mean={counts.mean():.0f} p50={np.percentile(counts,50):.0f} "
              f"p95={np.percentile(counts,95):.0f} p99={np.percentile(counts,99):.0f} max={counts.max()} "
              f"prims/ray={counts.mean()*16:.0f}", flush=True)
