"""100M experiment: S=16 subpackets per g-block (halves the routed-pair
count, the diagnosed per-pair-overhead bottleneck) + LBVH build.

Usage: python tools/bench_100m_s16.py [n] [S]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp

from tracer.bvh.device import build_bvh_device
from tracer.bench.timing import time_chained, fence
from tracer.scene.scene import benchmark_scene
from tracer.kernels.conecull import build_cone_tables, kernel_order_dest
from tracer.kernels.leafcull import prep_feats_bucketed
from tracer.kernels.tlas import nearest_hit_tlas_split

B = 512 * 1024
SP = 128


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((B, 3), jnp.float32)
    d = jnp.asarray(d)

    scene = benchmark_scene(jax.random.PRNGKey(n), n, world_size=1000.0)
    fb = jax.jit(lambda c, r: build_bvh_device(c, r, leaf_size=32))
    fence(fb(scene.centers, scene.radii))
    t0 = time.time()
    bvh = fb(scene.centers, scene.radii)
    fence(bvh)
    print(f"LBVH build {time.time()-t0:.1f}s", flush=True)
    tables = build_cone_tables(scene, bvh, max_chunk_bytes=5 << 20)
    del scene
    C = tables.cull.num_chunks
    g_est = (B + 512 * SP) // (S * SP) + 1
    npairs = min(C * g_est, 200 * g_est)
    npairs = (npairs // 128 + 1) * 128
    kc = min(C, 768)
    print(f"C={C} S={S} g~{g_est} npairs={npairs} kc={kc}", flush=True)

    def f(oo, dd, tb):
        feats, dest = prep_feats_bucketed(oo, dd, S, SP, cell_bits=8)
        t, slot, ovf = nearest_hit_tlas_split(
            feats, tb, max_groups=32, max_candidates=119,
            npairs=npairs, kc=kc, pair_block=4096)
        return t, kernel_order_dest(dest, S, SP), ovf

    out = f(o, d, tables)
    ovf = bool(np.asarray(out[-1]))
    dt = time_chained(f, o, d, tables, n1=1, n2=4, repeats=1)
    print(f"S={S}: {dt*1e3:.1f} ms ({B/dt/1e6:.3f} Mrays/s) overflow={ovf}",
          flush=True)


if __name__ == "__main__":
    main()
