"""Routing/budget diagnostics for the TLAS path at large n.

Usage: python tools/diag_tlas.py [n_spheres]
Prints routed-pair statistics and phase-A budget pressure so the sweep's
static budgets (npairs, kc, mg, mc) can be set from data.
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
from tracer.kernels.conecull import build_cone_tables, bounds_from_feats
from tracer.kernels.leafcull import prep_feats_bucketed
from tracer.kernels.tlas import route_pairs, tlas_candidates

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
    t0 = time.time()
    bvh = build_bvh(cnp, rnp, leaf_size=32)
    print(f"build {(time.time()-t0):.0f}s", flush=True)
    tables = build_cone_tables(scene, bvh)
    cull = tables.cull
    C = cull.num_chunks
    gpc = cull.leaves_per_chunk // cull.leaves_per_group
    print(f"chunks={C} lpc={cull.leaves_per_chunk} gpc={gpc}", flush=True)

    feats, dest = jax.jit(
        lambda oo, dd: prep_feats_bucketed(oo, dd, S, SP, cell_bits=8))(o, d)
    g = feats.shape[0]

    @jax.jit
    def stats(feats, tb):
        o_lo, o_hi, d_lo, d_hi = bounds_from_feats(feats)
        from tracer.kernels.conecull import _slab_hit_cols
        cmin = tb.cull.group_min.reshape(C, gpc, 3).min(1)
        cmax = tb.cull.group_max.reshape(C, gpc, 3).max(1)
        chit = _slab_hit_cols(o_lo, o_hi, d_lo, d_hi,
                              tuple(cmin[None, :, a] for a in range(3)),
                              tuple(cmax[None, :, a] for a in range(3)))
        real_chunk = (jnp.arange(C) * tb.cull.leaves_per_chunk
                      < tb.cull.num_real_leaves)
        chit = chit & real_chunk[None, :]
        gbhit = jnp.any(chit.reshape(g, S, C), axis=1)
        return (jnp.sum(gbhit), jnp.sum(gbhit, axis=1),   # per-gblock chunks
                jnp.sum(gbhit, axis=0))                   # per-chunk gblocks

    total, per_gb, per_chunk = stats(feats, tables)
    per_gb = np.asarray(per_gb)
    per_chunk = np.asarray(per_chunk)
    print(f"g-blocks={g} total pairs={int(total)} "
          f"(npairs mult = {int(total)/g:.1f}x g)", flush=True)
    print(f"chunks per g-block: mean={per_gb.mean():.1f} "
          f"p95={np.percentile(per_gb,95):.0f} max={per_gb.max()}",
          flush=True)
    print(f"g-blocks per chunk: mean={per_chunk.mean():.1f} "
          f"max={per_chunk.max()}", flush=True)

    # phase-A budget pressure at the routed budgets (device-side stats:
    # the rows buffer itself is hundreds of MB at 100M).
    for mg, mc in [(32, 119)]:
        npairs = int(min(C * g, ((int(total) * 3 // 2) // 128 + 1) * 128))
        kcv = min(C, int(per_gb.max()) + 8)

        @jax.jit
        def probe(f, tb, mg=mg, mc=mc, npairs=npairs, kcv=kcv):
            rows, pc, pg, mp, ovf = tlas_candidates(f, tb, mg, mc, npairs,
                                                    kcv)
            cnt = rows[:, 0, :, 0]
            return (ovf, jnp.sum(cnt < 0), cnt.size,
                    jnp.max(cnt), jnp.percentile(
                        jnp.where(cnt >= 0, cnt, 0).astype(jnp.float32), 95))
        ovf, gneg, csz, cmax, p95 = probe(feats, tables)
        print(f"mg={mg} mc={mc} npairs={npairs} kc={kcv}: "
              f"overflow={bool(ovf)} group-mode rows={int(gneg)}/{int(csz)} "
              f"cnt p95={float(p95):.0f} max={int(cmax)}", flush=True)


if __name__ == "__main__":
    main()
