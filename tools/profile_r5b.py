"""Round-5 experiment batch B: prep prefix decomposition (chained) +
kernel budget/subpacket sweep + dense brute at small n.

Usage: python tools/profile_r5b.py
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
from tracer.core.sort import (octahedral_codes, plan_bucket_pad, gather_rays,
                              prep_rays_bucketed)

N = 100_000
B = 512 * 1024
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

    SP = 128

    print("== prep prefixes (chained, each includes all previous) ==",
          flush=True)

    def p_codes(oo, dd):
        return octahedral_codes(dd)

    def p_sort(oo, dd):
        codes = octahedral_codes(dd)
        iota = jnp.arange(B, dtype=jnp.int32)
        return jax.lax.sort((codes, iota), dimension=0, num_keys=1)

    def p_plan(oo, dd):
        sc, perm = p_sort(oo, dd)
        return plan_bucket_pad(sc, SP, cell_bits=CELL_BITS)

    def p_gather(oo, dd):
        sc, perm = p_sort(oo, dd)
        src, dest_sorted = plan_bucket_pad(sc, SP, cell_bits=CELL_BITS)
        return gather_rays(oo, dd, perm[src])

    def p_full(oo, dd):
        return prep_rays_bucketed(Ray(origin=oo, direction=dd), SP,
                                  cell_bits=CELL_BITS)

    for name, fn in [("codes", p_codes), ("codes+sort", p_sort),
                     ("+plan", p_plan), ("+gather", p_gather),
                     ("FULL prep", p_full)]:
        ms = chain_timeit(fn, o, d)
        print(f"{name}: {ms:.2f} ms", flush=True)

    print("== kernel budget / subpacket sweep (full fused, chained) ==",
          flush=True)
    from tracer.kernels.conecull import (build_cone_tables,
                                         nearest_hit_hybrid_raw,
                                         kernel_order_dest)
    tables = build_cone_tables(scene, bvh)

    for sp, s_, mg, mc in [
        (128, 8, 64, 119),     # shipped r4 config
        (128, 8, 64, 247),     # bigger leaf budget: kill group-mode tail
        (128, 8, 128, 247),
        (128, 8, 64, 183),
        (64, 8, 64, 119),      # narrower frustums
        (64, 16, 64, 119),
        (256, 4, 64, 247),     # wider frustums
    ]:
        def full(oo, dd, tb, sp=sp, s_=s_, mg=mg, mc=mc):
            rays, dest = prep_rays_bucketed(
                Ray(origin=oo, direction=dd), sp, cell_bits=CELL_BITS)
            t, slot, ovf = nearest_hit_hybrid_raw(
                rays, tb, max_groups=mg, max_candidates=mc,
                subpackets=s_, subpacket=sp)
            return t, slot, kernel_order_dest(dest, s_, sp), ovf

        try:
            ms = chain_timeit(full, o, d, tables)
            print(f"sp={sp} s={s_} mg={mg} mc={mc}: {ms:.2f} ms "
                  f"({B/ms/1e3:.1f} Mrays/s)", flush=True)
        except Exception as e:
            print(f"sp={sp} s={s_} mg={mg} mc={mc}: FAILED "
                  f"{type(e).__name__}: {e}", flush=True)

    print("== dense brute at small n (chained) ==", flush=True)
    from tracer.intersect.brute import brute_t_fast
    for n_small in (1000, 2000, 4000, 10000):
        sc2 = benchmark_scene(jax.random.PRNGKey(7), n_small,
                              world_size=1000.0)
        for blk in (4096, 8192, 16384):
            f = lambda oo, dd, cc, rr: brute_t_fast(oo, dd, cc, rr,
                                                    block=blk)
            ms = chain_timeit(f, o, d, sc2.centers, sc2.radii)
            print(f"brute_fast n={n_small} block={blk}: {ms:.2f} ms "
                  f"({B/ms/1e3:.1f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
