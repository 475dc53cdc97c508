"""Round-5 profiling: plan_bucket_pad internals, multi-operand sorts,
cumsum shapes, and the fused-vs-sum gap (VERDICT r4 Weak 1/2).

Usage: python tools/profile_r5.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tracer.core.types import Ray
from tracer.bvh.builder import build_bvh
from tracer.scene.scene import benchmark_scene
from tracer.core.sort import octahedral_codes, prep_rays_bucketed

N = 100_000
B = 512 * 1024
SP = 128
CELL_BITS = 8
S = 8
MG, MC = 64, 119


def fence(out):
    acc = jnp.float32(0)
    for x in jax.tree_util.tree_leaves(out):
        if hasattr(x, "ravel") and x.size:
            acc = acc + x.ravel()[0].astype(jnp.float32)
    return float(jax.device_get(acc))


def timeit(fn, *args, n1=2, n2=10, repeats=2):
    out = fn(*args)
    fence(out)

    def run(n):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        fence(outs)
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(repeats):
        best = min(best, (run(n2) - run(n1)) / (n2 - n1))
    return best * 1e3, out  # ms


def main():
    scene = benchmark_scene(jax.random.PRNGKey(1), N, world_size=1000.0)
    c = np.asarray(scene.centers)
    r = np.asarray(scene.radii)
    bvh = build_bvh(c, r, leaf_size=32)

    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((B, 3), jnp.float32)
    d = jnp.asarray(d)

    codes = jax.jit(octahedral_codes)(d)
    sc = jnp.sort(codes)
    iota = jnp.arange(B, dtype=jnp.int32)

    print("== plan_bucket_pad internals ==", flush=True)
    ncells = 1 << CELL_BITS
    bp = B + ncells * SP

    def f_search(sc):
        cid = jnp.arange(ncells, dtype=jnp.int32)
        edges = (cid.astype(jnp.uint32) << (32 - CELL_BITS))
        bounds = jnp.searchsorted(
            sc, jnp.concatenate([edges,
                                 jnp.array([jnp.uint32(0xFFFFFFFF)])]),
            side="left").astype(jnp.int32)
        return bounds
    ms, bounds = timeit(jax.jit(f_search), sc)
    print(f"searchsorted bounds (257 queries): {ms:.2f} ms", flush=True)

    def f_cellgather(sc):
        cell = (sc >> (32 - CELL_BITS)).astype(jnp.int32)
        tbl = jnp.arange(ncells, dtype=jnp.int32) * 3
        return iota + tbl[cell]
    ms, _ = timeit(jax.jit(f_cellgather), sc)
    print(f"dest: pad_before[cell] (B,)-gather from 256: {ms:.2f} ms",
          flush=True)

    def f_markers(bounds):
        markers = jnp.zeros((bp + 1,), jnp.int32).at[bounds[:-1]].add(1)
        pcell = jnp.clip(jnp.cumsum(markers[:bp]) - 1, 0, ncells - 1)
        return pcell
    ms, pcell = timeit(jax.jit(f_markers), bounds)
    print(f"markers scatter + (bp,) cumsum + clip: {ms:.2f} ms", flush=True)

    def f_tablegather(pcell, bounds):
        start = bounds[:-1]
        cnt = bounds[1:] - bounds[:-1]
        table = jnp.stack([start, start, cnt], axis=1)[pcell]
        pos = jnp.arange(bp, dtype=jnp.int32)
        rel = pos - table[:, 0]
        return table[:, 1] + jnp.minimum(rel, jnp.maximum(table[:, 2] - 1, 0))
    ms, _ = timeit(jax.jit(f_tablegather), pcell, bounds)
    print(f"table[pcell] (bp,3) row gather + math: {ms:.2f} ms", flush=True)

    # scatter-delta + cumsum reformulation: all per-element tables via one
    # (rows, bp) cumsum of 256-scatter deltas, NO per-element gathers.
    def f_delta(bounds):
        start = bounds[:-1]
        cnt = bounds[1:] - bounds[:-1]
        pad = (SP - cnt % SP) % SP
        pad_before = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(pad)[:-1].astype(jnp.int32)])
        pstart = start + pad_before
        cap = start + jnp.maximum(cnt - 1, 0)
        d_shift = jnp.diff(pad_before, prepend=0)
        d_cap = jnp.diff(cap, prepend=cap[:1] - cap[:1])
        rows = jnp.zeros((2, bp), jnp.int32)
        rows = rows.at[0, pstart].add(d_shift)
        rows = rows.at[1, pstart].add(d_cap)
        cum = jnp.cumsum(rows, axis=1)
        pos = jnp.arange(bp, dtype=jnp.int32)
        shift = cum[0]
        capv = cum[1] + cap[0]
        src = jnp.clip(jnp.minimum(pos - shift, capv), 0, B - 1)
        return src
    ms, src2 = timeit(jax.jit(f_delta), bounds)
    print(f"scatter-delta + (2,bp) cumsum src: {ms:.2f} ms", flush=True)

    # verify equivalence with the shipped plan
    from tracer.core.sort import plan_bucket_pad
    src_ref, dest_ref = jax.jit(
        lambda sc: plan_bucket_pad(sc, SP, CELL_BITS))(sc)
    ok = bool(jnp.all(src_ref == src2))
    print(f"  src equivalence vs plan_bucket_pad: {ok}", flush=True)

    print("== multi-operand sorts (B=512k) ==", flush=True)
    cols = [codes, iota] + [d[:, i] for i in range(3)] \
        + [o[:, i] for i in range(3)]
    for k in (1, 2, 5, 8):
        f = jax.jit(lambda *xs: jax.lax.sort(xs, dimension=0, num_keys=1))
        ms, _ = timeit(f, *cols[:k])
        print(f"lax.sort {k} operands: {ms:.2f} ms", flush=True)

    print("== cumsum shapes ==", flush=True)
    x1 = jnp.ones((bp,), jnp.int32)
    ms, _ = timeit(jax.jit(jnp.cumsum), x1)
    print(f"cumsum (bp,): {ms:.2f} ms", flush=True)
    x2 = jnp.ones((4, bp), jnp.int32)
    ms, _ = timeit(jax.jit(lambda x: jnp.cumsum(x, axis=1)), x2)
    print(f"cumsum (4,bp) axis=1: {ms:.2f} ms", flush=True)

    print("== fused prefix deltas (the 11 ms gap) ==", flush=True)
    from tracer.kernels.conecull import (build_cone_tables, cone_candidates,
                                         nearest_hit_hybrid_raw,
                                         kernel_order_dest)
    from tracer.kernels.leafcull import pack_ray_features, _leafcull_call
    tables = build_cone_tables(scene, bvh)
    cull = tables.cull

    def prep(oo, dd):
        rays, dest = prep_rays_bucketed(Ray(origin=oo, direction=dd), SP,
                                        cell_bits=CELL_BITS)
        return rays, kernel_order_dest(dest, S, SP)

    def upto_feats(oo, dd):
        rays, dest2 = prep(oo, dd)
        feats, g, pad = pack_ray_features(rays.origin, rays.direction, S, SP)
        return feats, dest2

    def upto_phaseA(oo, dd, tb):
        rays, dest2 = prep(oo, dd)
        feats, g, pad = pack_ray_features(rays.origin, rays.direction, S, SP)
        rows, ovf = cone_candidates(feats, tb, MG, MC)
        return rows, dest2, ovf

    def full(oo, dd, tb):
        rays, dest2 = prep(oo, dd)
        t, slot, ovf = nearest_hit_hybrid_raw(
            rays, tb, max_groups=MG, max_candidates=MC,
            subpackets=S, subpacket=SP)
        return t, slot, dest2, ovf

    ms, _ = timeit(jax.jit(prep), o, d)
    print(f"fused prefix [prep]: {ms:.2f} ms", flush=True)
    ms, _ = timeit(jax.jit(upto_feats), o, d)
    print(f"fused prefix [prep+feats]: {ms:.2f} ms", flush=True)
    ms, _ = timeit(jax.jit(upto_phaseA), o, d, tables)
    print(f"fused prefix [prep+feats+phaseA]: {ms:.2f} ms", flush=True)
    ms, _ = timeit(jax.jit(full), o, d, tables)
    print(f"fused FULL: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
