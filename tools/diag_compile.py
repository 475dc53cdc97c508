"""Compile-only bisection of the 100M TLAS pipeline (no data, AOT lower).

Usage: python tools/diag_compile.py
Fabricates shape-correct inputs for the 100M configuration and compiles
each stage separately to find which program crashes tpu_compile_helper.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tracer.kernels.leafcull import CullTables, FEAT
from tracer.kernels.conecull import ConeTables
from tracer.kernels import tlas

# 100M sweep shapes (tools/diag_tlas.py)
C, lpc, lpg, ls = 1421, 3072, 16, 32
gpc = lpc // lpg
L = C * lpc
g, S, SP = 544, 8, 128
npairs, kc, pblk, mg, mc = 78336, 512, 4096, 32, 119
num_real = 3_125_000

f32 = jnp.float32
i32 = jnp.int32
sds = jax.ShapeDtypeStruct

cull = CullTables(
    entries=sds((C, lpc // 2 + 1, 8, 128), f32),
    leaf_min=sds((L, 3), f32), leaf_max=sds((L, 3), f32),
    group_boxes=sds((L // lpg, lpg * 8), f32),
    group_min=sds((L // lpg, 3), f32), group_max=sds((L // lpg, 3), f32),
    slot_to_sphere=sds((L * ls,), i32),
    leaf_size=ls, leaves_per_group=lpg, leaves_per_chunk=lpc,
    num_leaves=L, num_real_leaves=num_real)
tables = ConeTables(cull=cull, leaf_boxes=sds((L // lpg, lpg * 6), f32),
                    r_max=0.5)
feats = sds((g, S, SP, FEAT), f32)
bounds = sds((g * S, 3), f32)


def try_compile(name, fn, *args):
    try:
        lowered = jax.jit(fn).lower(*args)
        lowered.compile()
        print(f"{name}: OK", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def main():
    try_compile(
        "route_pairs", lambda b1, b2, b3, b4, tb: tlas.route_pairs(
            b1, b2, b3, b4, tb, S, npairs, kc),
        bounds, bounds, bounds, bounds, tables)
    try_compile(
        "tlas_candidates", lambda f, tb: tlas.tlas_candidates(
            f, tb, mg, mc, npairs, kc, pair_block=pblk),
        feats, tables)
    rows = sds((npairs, 1, S, 128), i32)
    pc = sds((npairs,), i32)
    try_compile(
        "routed_call", lambda pc_, pg_, rr, f, e: tlas._routed_call(
            pc_, pg_, rr, f, e, S, SP, ls, lpc, lpg),
        pc, pc, rows, feats, cull.entries)
    for npx in (24576, 32768, 49152):
        rows2 = sds((npx, 1, S, 128), i32)
        pc2 = sds((npx,), i32)
        try_compile(
            f"routed_call@{npx}", lambda pc_, pg_, rr, f, e: tlas._routed_call(
                pc_, pg_, rr, f, e, S, SP, ls, lpc, lpg),
            pc2, pc2, rows2, feats, cull.entries)
    tp = sds((npairs, SP, S), f32)
    sp_ = sds((npairs, SP, S), i32)
    mp = sds((g, kc), i32)
    try_compile("tlas_merge", tlas._tlas_merge, tp, sp_, mp)


if __name__ == "__main__":
    main()
