"""Locate the fused-vs-sum gap (VERDICT r4 Weak 1): time nested prefixes
of the exact bench.py fused pipeline, with CHAINED calls (each call's input
data-depends on the previous output) so no caching/dedup can hide work.

Usage: python tools/profile_gap.py
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
from tracer.core.sort import prep_rays_bucketed

N = 100_000
B = 512 * 1024
SP = 128
CELL_BITS = 8
S = 8
MG, MC = 64, 119


def chain_timeit(fn, o, d, *rest, n1=2, n2=8, repeats=2):
    """fn(o, d, *rest) -> pytree. Chains calls: call k+1's origin input is
    o + eps_k where eps_k data-depends on call k's outputs, forcing real
    sequential execution of every call."""
    def wrapped(o_in, d_in, carry):
        out = fn(o_in + carry * 0.0, d_in, *rest)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "ravel") and x.size]
        c = jnp.float32(0)
        for x in leaves:
            c = c + x.ravel()[0].astype(jnp.float32)
        return out, c * jnp.float32(1e-30)

    jw = jax.jit(wrapped)
    out, c = jw(o, d, jnp.float32(0))
    float(jax.device_get(c))

    def run(n):
        carry = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            out, carry = jw(o, d, carry)
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
        out = cone_candidates(feats, tb, MG, MC)
        return out[0], dest2, out[-1]

    def full(oo, dd, tb):
        rays, dest2 = prep(oo, dd)
        t, slot, ovf = nearest_hit_hybrid_raw(
            rays, tb, max_groups=MG, max_candidates=MC,
            subpackets=S, subpacket=SP)
        return t, slot, dest2, ovf

    for name, fn, args in [
        ("codes+sort only", lambda oo, dd: jax.lax.sort(
            (jnp.zeros((B,), jnp.uint32), jnp.arange(B, dtype=jnp.int32)),
            dimension=0, num_keys=1), ()),
        ("prep", prep, ()),
        ("prep+feats", upto_feats, ()),
        ("prep+feats+phaseA", upto_phaseA, (tables,)),
        ("FULL fused", full, (tables,)),
    ]:
        ms = chain_timeit(fn, o, d, *args)
        print(f"{name}: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
