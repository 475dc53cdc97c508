"""Round-5 experiment batch C: payload-permutation mechanisms for prep.

Hypothesis: the 11.4 ms "gather" in prep is mostly OUTPUT LAYOUT — the
(bp, 3) padded ray arrays tile 3 -> 128 lanes (42x write inflation).
Variants keep the gather but change what is materialized.

Usage: python tools/profile_r5c.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tracer.core.types import Ray
from tracer.core.sort import (octahedral_codes, plan_bucket_pad,
                              prep_rays_bucketed)
from tracer.kernels.leafcull import FEAT, pack_ray_features
from tracer.intersect.sphere import EPSILON

B = 512 * 1024
SP = 128
S = 8
CELL_BITS = 8


def chain_timeit(fn, *args, n1=2, n2=8, repeats=2):
    def wrapped(carry, *a):
        x0 = a[0] + (carry * 0).astype(a[0].dtype)
        out = fn(x0, *a[1:])
        c = jnp.float32(0)
        for x in jax.tree_util.tree_leaves(out):
            if hasattr(x, "ravel") and getattr(x, "size", 0):
                c = c + x.ravel()[0].astype(jnp.float32)
        return out, c * jnp.float32(1e-30)

    jw = jax.jit(wrapped)
    out, c = jw(jnp.float32(0), *args)
    float(jax.device_get(c))

    def run(n):
        carry = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            out, carry = jw(carry, *args)
        float(jax.device_get(carry))
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(repeats):
        best = min(best, (run(n2) - run(n1)) / (n2 - n1))
    return best * 1e3


def sort_and_plan(o, d):
    codes = octahedral_codes(d)
    iota = jnp.arange(B, dtype=jnp.int32)
    sc, perm = jax.lax.sort((codes, iota), dimension=0, num_keys=1)
    src, dest_sorted = plan_bucket_pad(sc, SP, cell_bits=CELL_BITS)
    idx = perm[src]
    _, dest = jax.lax.sort((perm, dest_sorted), dimension=0, num_keys=1)
    return idx, dest


def feat_cols(o, d):
    zeros = jnp.zeros_like(o[:, 0])
    ones = jnp.ones_like(o[:, 0])
    od = jnp.sum(o * d, axis=-1)
    oo = jnp.sum(o * o, axis=-1)
    a = jnp.sum(d * d, axis=-1)
    inva = 1.0 / jnp.maximum(a, 1e-30)
    cols = [d[:, 0], d[:, 1], d[:, 2],
            -2.0 * o[:, 0], -2.0 * o[:, 1], -2.0 * o[:, 2],
            ones, zeros, od, oo, a, inva, EPSILON * a,
            jnp.full_like(a, -3e38)]
    cols += [zeros] * (FEAT - len(cols))
    return cols


def main():
    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((B, 3), jnp.float32)
    d = jnp.asarray(d)

    # A: shipped prep (gather -> two (bp, 3) arrays) + feats pack
    def prep_a(oo, dd):
        rays, dest = prep_rays_bucketed(Ray(origin=oo, direction=dd), SP,
                                        cell_bits=CELL_BITS)
        feats, g, pad = pack_ray_features(rays.origin, rays.direction, S, SP)
        return feats, dest

    # B: packed (bp, 8) output, slice lazily into the feats pack
    def prep_b(oo, dd):
        idx, dest = sort_and_plan(oo, dd)
        packed = jnp.concatenate(
            [oo, dd, jnp.zeros((B, 2), jnp.float32)], axis=1)[idx]
        op, dp = packed[:, 0:3], packed[:, 3:6]
        feats, g, pad = pack_ray_features(op, dp, S, SP)
        return feats, dest

    # C: gather (bp, FEAT) rows from a (B, FEAT) feats table
    def prep_c(oo, dd):
        idx, dest = sort_and_plan(oo, dd)
        table = jnp.stack(feat_cols(oo, dd), axis=-1)      # (B, FEAT)
        feats = table[idx]                                 # (bp, FEAT)
        return feats.reshape(-1, S, SP, FEAT), dest

    # D: transposed (FEAT, B) table, lane gather, one transpose at the end
    def prep_d(oo, dd):
        idx, dest = sort_and_plan(oo, dd)
        table = jnp.stack(feat_cols(oo, dd), axis=0)       # (FEAT, B)
        ft = table[:, idx]                                 # (FEAT, bp)
        bp = ft.shape[1]
        feats = ft.reshape(FEAT, -1, S, SP).transpose(1, 2, 3, 0)
        return feats, dest

    # E: row scatter instead of gather (timing only: pad slots left zero)
    def prep_e(oo, dd):
        codes = octahedral_codes(dd)
        iota = jnp.arange(B, dtype=jnp.int32)
        sc, perm = jax.lax.sort((codes, iota), dimension=0, num_keys=1)
        src, dest_sorted = plan_bucket_pad(sc, SP, cell_bits=CELL_BITS)
        _, dest = jax.lax.sort((perm, dest_sorted), dimension=0, num_keys=1)
        bp = src.shape[0]
        table = jnp.stack(feat_cols(oo, dd), axis=-1)      # (B, FEAT)
        feats = jnp.zeros((bp, FEAT), jnp.float32).at[dest].set(table)
        return feats.reshape(-1, S, SP, FEAT), dest

    for name, fn in [("A shipped (Ray out + pack)", prep_a),
                     ("B packed (bp,8) out", prep_b),
                     ("C feats row gather (bp,16)", prep_c),
                     ("D transposed lane gather (16,bp)", prep_d),
                     ("E feats row scatter", prep_e)]:
        try:
            ms = chain_timeit(fn, o, d)
            print(f"{name}: {ms:.2f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # equivalence spot check: C vs A on real values
    fa = jax.jit(prep_a)
    fc = jax.jit(prep_c)
    fd = jax.jit(prep_d)
    (Fa, da) = fa(o, d)
    (Fc, dc) = fc(o, d)
    (Fd, dd2) = fd(o, d)
    print("C == A feats:", bool(jnp.allclose(Fa, Fc)),
          "dest:", bool(jnp.all(da == dc)), flush=True)
    print("D == A feats:", bool(jnp.allclose(Fa, Fd)), flush=True)


if __name__ == "__main__":
    main()
