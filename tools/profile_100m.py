"""Stage profile of the 100M TLAS path (split jits, chained timing).

Usage: python tools/profile_100m.py [n]
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
from tracer.kernels.conecull import build_cone_tables, kernel_order_dest
from tracer.kernels.leafcull import prep_feats_bucketed
from tracer.kernels import tlas

B = 512 * 1024
SP, S = 128, 8


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
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
    del scene
    C = tables.cull.num_chunks
    g_est = (B + 256 * SP) // (S * SP) + 1
    if C <= 32:
        pm, kc, pblk, mg = 24, 48, 8192, 128
    elif C <= 256:
        pm, kc, pblk, mg = 40, 128, 8192, 32
    else:
        pm, kc, pblk, mg = 144, 512, 4096, 32
    npairs = min(C * g_est, max(4096, pm * g_est))
    kc = min(C, kc)
    print(f"C={C} npairs={npairs} kc={kc}", flush=True)

    prep_j = jax.jit(lambda oo, dd: prep_feats_bucketed(oo, dd, S, SP,
                                                        cell_bits=8))
    feats, dest = prep_j(o, d)
    ms = time_chained(lambda oo, dd: prep_j(oo, dd), o, d) * 1e3
    print(f"prep: {ms:.1f} ms", flush=True)

    cand = jax.jit(tlas.tlas_candidates, static_argnames=(
        "max_groups", "max_candidates", "npairs", "kc", "pair_block",
        "interpret"))
    rows, pair_c, pair_gb, merge_pos, ovf = cand(
        feats, tables, mg, 119, npairs, kc, pair_block=pblk)
    ms = time_chained(lambda f, tb: cand(f, tb, mg, 119, npairs, kc,
                                         pair_block=pblk),
                      feats, tables) * 1e3
    print(f"candidates (route + phase A): {ms:.1f} ms overflow={bool(ovf)}",
          flush=True)

    cull = tables.cull

    def kern(f, rr, pc, pg, e):
        KSPLIT = 24576
        nsplit = -(-npairs // KSPLIT)
        tps, sps = [], []
        for i in range(nsplit):
            lo = i * KSPLIT
            hi = min(npairs, lo + KSPLIT)
            tp, sp_ = tlas._routed_call(
                pc[lo:hi], pg[lo:hi], rr[lo:hi], f, e, S, SP,
                cull.leaf_size, cull.leaves_per_chunk,
                cull.leaves_per_group)
            tps.append(tp)
            sps.append(sp_)
        return jnp.concatenate(tps), jnp.concatenate(sps)

    t_p, slot_p = kern(feats, rows, pair_c, pair_gb, cull.entries)
    ms = time_chained(lambda f, rr, pc, pg, e: kern(f, rr, pc, pg, e),
                      feats, rows, pair_c, pair_gb, cull.entries) * 1e3
    print(f"kernel ({-(-npairs//24576)} splits): {ms:.1f} ms", flush=True)

    ms = time_chained(lambda tp, sp_, mp: tlas._tlas_merge(tp, sp_, mp),
                      t_p, slot_p, merge_pos) * 1e3
    print(f"merge (kc={kc}): {ms:.1f} ms", flush=True)

    # candidate-row stats (kernel work estimate)
    cnt = np.asarray(rows[:, 0, :, 0]).reshape(-1)
    gm = cnt < 0
    print(f"rows: {len(cnt)} pair-subpackets, group-mode {gm.sum()} "
          f"({100*gm.mean():.1f}%), leaf cnt p50={np.percentile(cnt[~gm],50):.0f} "
          f"p95={np.percentile(cnt[~gm],95):.0f}", flush=True)


if __name__ == "__main__":
    main()
