"""Compare dense-chunk vs TLAS-routed multi-chunk paths at 1M/10M.

Usage: python tools/bench_tlas.py [n_spheres ...]
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
from tracer.scene.scene import benchmark_scene
from tracer.bench.timing import time_chained
from tracer.kernels.conecull import (build_cone_tables,
                                     nearest_hit_hybrid_feats,
                                     kernel_order_dest)
from tracer.kernels.leafcull import prep_feats_bucketed
from tracer.kernels.tlas import nearest_hit_tlas_feats

B = 512 * 1024
SP, S = 128, 8


def main():
    sizes = [int(x) for x in sys.argv[1:]] or [1_000_000]
    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((B, 3), jnp.float32)
    d = jnp.asarray(d)

    for n in sizes:
        scene = benchmark_scene(jax.random.PRNGKey(n), n, world_size=1000.0)
        cnp = np.asarray(scene.centers)
        rnp = np.asarray(scene.radii)
        t0 = time.time()
        bvh = build_bvh(cnp, rnp, leaf_size=32)
        print(f"n={n}: build {(time.time()-t0)*1000:.0f} ms", flush=True)
        tables = build_cone_tables(scene, bvh)
        C = tables.cull.num_chunks
        print(f"  chunks={C} entries={tables.cull.entries.nbytes/1e6:.0f}MB",
              flush=True)
        mg = 64 if n <= 300_000 else (128 if n <= 3_000_000 else 256)

        def dense(oo, dd, tb, mg=mg):
            feats, dest = prep_feats_bucketed(oo, dd, S, SP, cell_bits=8)
            t, slot, ovf = nearest_hit_hybrid_feats(
                feats, tb, max_groups=mg, max_candidates=119)
            return t, kernel_order_dest(dest, S, SP), ovf

        g_est = (B + 256 * SP) // (S * SP) + 1

        def make_tlas(npm, kcv, mgv=mg, C=C):
            npq = min(C * g_est, npm * g_est)

            def f(oo, dd, tb):
                feats, dest = prep_feats_bucketed(oo, dd, S, SP,
                                                  cell_bits=8)
                t, slot, ovf = nearest_hit_tlas_feats(
                    feats, tb, max_groups=mgv, max_candidates=119,
                    npairs=npq, kc=min(kcv, C))
                return t, kernel_order_dest(dest, S, SP), ovf
            return f

        import os
        spec = os.environ.get("TLAS_VARIANTS", "8:16:0,24:48:0")
        variants = []
        for v in spec.split(","):
            npm_s, kcv_s, mg_s = v.split(":")
            mgv = int(mg_s) or mg
            variants.append((f"tlas x{npm_s}/kc{kcv_s}/mg{mgv}",
                             make_tlas(int(npm_s), int(kcv_s), mgv)))
        if os.environ.get("TLAS_DENSE"):
            variants.insert(0, ("dense_chunks", dense))
        for name, fn in variants:
            try:
                jf = jax.jit(fn)
                out = jf(o, d, tables)
                ovf = bool(np.asarray(out[-1]))
                dt = time_chained(jf, o, d, tables)
                print(f"  {name}: {dt*1e3:.1f} ms ({B/dt/1e6:.2f} Mrays/s) "
                      f"overflow={ovf}", flush=True)
            except Exception as e:
                print(f"  {name}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
