"""Device-LBVH vs host-SAH at large n: build time and query quality.

Usage: python tools/bench_lbvh.py [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp

from tracer.bvh.builder import build_bvh
from tracer.bvh.device import build_bvh_device
from tracer.bench.timing import time_chained
from tracer.scene.scene import benchmark_scene
from tracer.kernels.conecull import build_cone_tables, kernel_order_dest
from tracer.kernels.leafcull import prep_feats_bucketed
from tracer.kernels.tlas import nearest_hit_tlas_feats

B = 512 * 1024
SP, S = 128, 8


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((B, 3), jnp.float32)
    d = jnp.asarray(d)

    scene = benchmark_scene(jax.random.PRNGKey(n), n, world_size=1000.0)
    cnp = np.asarray(scene.centers)
    rnp = np.asarray(scene.radii)

    # on-device LBVH build time (chained)
    fb = jax.jit(lambda c, r: build_bvh_device(c, r, leaf_size=32))
    dtb = time_chained(fb, scene.centers, scene.radii, n1=1, n2=3,
                       repeats=1)
    print(f"LBVH device build: {dtb*1e3:.1f} ms", flush=True)
    dbvh = fb(scene.centers, scene.radii)

    t0 = time.time()
    hbvh = build_bvh(cnp, rnp, leaf_size=32)
    print(f"host SAH build: {time.time()-t0:.1f} s", flush=True)

    g_est = (B + 256 * SP) // (S * SP) + 1
    for name, bvh in [("sah", hbvh), ("lbvh", dbvh)]:
        tables = build_cone_tables(scene, bvh)
        C = tables.cull.num_chunks
        if C <= 32:
            pm, kcv, mg = 24, 48, 128
        else:
            pm, kcv, mg = 40, 128, 32
        npairs = min(C * g_est, max(4096, pm * g_est))

        def f(oo, dd, tb, mg=mg, npairs=npairs, kcv=min(C, kcv)):
            feats, dest = prep_feats_bucketed(oo, dd, S, SP, cell_bits=8)
            t, slot, ovf = nearest_hit_tlas_feats(
                feats, tb, max_groups=mg, max_candidates=119,
                npairs=npairs, kc=kcv)
            return t, kernel_order_dest(dest, S, SP), ovf

        jf = jax.jit(f)
        out = jf(o, d, tables)
        ovf = bool(np.asarray(out[-1]))
        dt = time_chained(jf, o, d, tables)
        print(f"{name}: chunks={C} query {dt*1e3:.1f} ms "
              f"({B/dt/1e6:.2f} Mrays/s) overflow={ovf}", flush=True)
        del tables


if __name__ == "__main__":
    main()
