"""Benchmark sweep harness: BVH vs brute force over scene sizes.

The TPU-native re-expression of ``run_benchmark_with_plotting``
(src/benchmark.c:283-332): sweep sphere counts, generate the reference's
random scenes (r=0.5 in a world_size^3 box), time closest-hit for a batch of
origin rays with and without the BVH, and fit complexity curves the way
``results/main.py`` does (linear fit for brute force, log fit + log-log
slopes for BVH). gnuplot-subprocess plotting (src/benchmark.c:34-136) is
replaced by matplotlib; the data file format matches
``results/benchmark_data.txt`` ("n time_brute time_bvh").

Timing via tracer.bench.timing.time_device (fenced slope method): compile
time excluded, dispatch latency cancelled, real device completion forced
(block_until_ready lies through remote tunnels).
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable

import numpy as np

from tracer.core.types import Ray


@dataclasses.dataclass
class SweepResult:
    sizes: list
    brute_s: list          # seconds per batch (NaN where skipped);
                           # extrapolated from brute_nb timed rays
    bvh_s: list            # seconds per batch, END TO END (prep included)
    build_ms: list
    num_rays: int
    path: str              # which traversal implementation was measured
    brute_nb: list = dataclasses.field(default_factory=list)
    row_paths: list = dataclasses.field(default_factory=list)  # per size

    def speedups(self):
        return [b / v if (b == b and v == v and v > 0) else float("nan")
                for b, v in zip(self.brute_s, self.bvh_s)]

    def mrays_bvh(self):
        return [self.num_rays / v / 1e6 if v == v and v > 0 else float("nan")
                for v in self.bvh_s]

    def to_json(self) -> dict:
        return {
            "sizes": list(map(int, self.sizes)),
            "brute_s": self.brute_s,
            "bvh_s": self.bvh_s,
            "build_ms": self.build_ms,
            "num_rays": self.num_rays,
            "brute_nb_timed": list(map(int, self.brute_nb)),
            "brute_note": "brute times at large n are linear extrapolations "
                          "from brute_nb_timed rays (work product capped)",
            "speedup": self.speedups(),
            "mrays_bvh": self.mrays_bvh(),
            "path": self.path,
            "row_paths": self.row_paths,
            "complexity": complexity_fit(self.sizes, self.brute_s, self.bvh_s),
        }

    def save_data_txt(self, path: str) -> None:
        """results/benchmark_data.txt-compatible: 'n brute_s bvh_s' rows."""
        with open(path, "w") as f:
            for n, b, v in zip(self.sizes, self.brute_s, self.bvh_s):
                f.write(f"{n} {b:.6f} {v:.6f}\n")


def complexity_fit(sizes, brute_s, bvh_s) -> dict:
    """The fits of results/main.py:20-87: brute ~ O(n) (linear fit +
    log-log slope ~ 1), BVH ~ O(log n) (log fit + log-log slope << 1)."""
    n = np.asarray(sizes, np.float64)
    out = {}
    bb = np.asarray(brute_s, np.float64)
    vv = np.asarray(bvh_s, np.float64)
    ok = np.isfinite(bb)
    if ok.sum() >= 2:
        slope = np.polyfit(np.log(n[ok]), np.log(bb[ok]), 1)[0]
        out["brute_loglog_slope"] = float(slope)
    ok = np.isfinite(vv) & (vv > 0)
    if ok.sum() >= 2:
        slope = np.polyfit(np.log(n[ok]), np.log(vv[ok]), 1)[0]
        out["bvh_loglog_slope"] = float(slope)
        # log fit: t = b*log(n) + a (results/main.py:24-26)
        coef = np.polyfit(np.log(n[ok]), vv[ok], 1)
        out["bvh_logfit"] = [float(coef[0]), float(coef[1])]
    return out


def _time_amortized(fn, n_calls: int = 4) -> float:
    from tracer.bench.timing import time_device
    del n_calls
    return time_device(fn)


def time_chained(fn, *args, **kw):
    from tracer.bench.timing import time_chained as _tc
    return _tc(fn, *args, **kw)


def run_sweep(sizes=(5000, 10000, 15000, 20000, 25000, 30000,
                     35000, 40000, 45000, 50000),
              num_rays: int = 131072, world_size: float = 1000.0,
              brute_limit: int = 20_000_000, use_pallas: bool = None,
              seed: int = 0, dense_limit: int = 4000,
              device_build_min_n: int = 5_000_000,
              log: Callable = print) -> SweepResult:
    """Run the sweep. Default sizes = the reference's in-repo sweep
    (src/benchmark.c:289-295); pass (1000, 10000, ..., 1e6+) for the
    published-data variant (src/benchmark.c:296).

    Brute force is timed with an adaptively smaller ray batch at large n
    (the O(n*rays) product is capped; the reference used a fixed 10k rays,
    src/benchmark.c:289) and normalized to seconds per ``num_rays`` rays.
    The BVH path is the leaf-cull Pallas kernel on TPU (bench.py's
    headline path) and the pure-jnp traversal elsewhere.
    """
    import jax
    import jax.numpy as jnp
    from tracer.bvh.builder import build_bvh
    from tracer.core.sort import sort_rays_by_direction, prep_rays_bucketed
    from tracer.intersect.brute import nearest_hit_brute
    from tracer.intersect.sphere import ray_sphere_t
    from tracer.scene.scene import benchmark_scene

    CHUNK = 65536

    def brute_t(rays: Ray, scene) -> jnp.ndarray:
        """Min-t brute force, lax.scan-chunked over spheres so the (B, N)
        pair matrix never materializes (131k rays x 100k spheres is a 52 GB
        allocation otherwise)."""
        n = scene.centers.shape[0]
        if n <= CHUNK:
            return nearest_hit_brute(rays, scene).t
        pad = (-n) % CHUNK
        c = jnp.concatenate(
            [scene.centers, jnp.full((pad, 3), 3.0e37, jnp.float32)])
        r = jnp.concatenate([scene.radii, jnp.zeros((pad,), jnp.float32)])
        o = rays.origin.reshape(-1, 3)
        d = rays.direction.reshape(-1, 3)

        def body(best, xs):
            cc, rr = xs
            t = ray_sphere_t(o[:, None], d[:, None], cc[None], rr[None])
            return jnp.minimum(best, jnp.min(t, axis=1)), None

        init = jnp.full((o.shape[0],), jnp.inf, jnp.float32)
        best, _ = jax.lax.scan(body, init,
                               (c.reshape(-1, CHUNK, 3),
                                r.reshape(-1, CHUNK)))
        return best

    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"

    if use_pallas:
        from tracer.kernels.conecull import (build_cone_tables,
                                             nearest_hit_hybrid_feats,
                                             kernel_order_dest)
        from tracer.kernels.leafcull import prep_feats_bucketed
        path = "hybrid_feats_fused"
    else:
        from tracer.intersect.traverse import nearest_hit_bvh
        path = "jnp_while_loop"

    rng = np.random.default_rng(seed)
    d = rng.uniform(-1, 1, (num_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(origin=jnp.zeros((num_rays, 3), jnp.float32),
               direction=jnp.asarray(d))

    res = SweepResult(sizes=list(sizes), brute_s=[], bvh_s=[], build_ms=[],
                      num_rays=num_rays, path=path, brute_nb=[])

    brute_fn = jax.jit(brute_t)
    for n in sizes:
        scene = benchmark_scene(jax.random.PRNGKey(seed + n), int(n),
                                world_size=world_size)
        # Materialize BEFORE the build timer: the first np.asarray pays
        # scene-gen compile + device->host transfer, not build cost.
        cnp = np.asarray(scene.centers)
        rnp = np.asarray(scene.radii)
        leaf = 32 if use_pallas else 8
        device_build = use_pallas and n >= device_build_min_n
        if device_build:
            # Large scenes build on-chip (SURVEY §2.5's "BVH build ms"
            # metric): the vectorized LBVH measured 648 ms at 10M where
            # the host binned SAH takes 20 s, with QUERY PARITY (4.79 vs
            # 4.71 Mrays/s through the TLAS path; tools/bench_lbvh.py).
            from tracer.bvh.device import build_bvh_device
            from tracer.bench.timing import fence
            fb = jax.jit(lambda c, r: build_bvh_device(c, r,
                                                       leaf_size=leaf))
            # Warm (compile) then time ONE fenced build: chained timing
            # holds two builds' temporaries live and OOMs at 100M (the
            # pow2-padded slot arrays are ~1.6 GB each); the single-shot
            # includes one dispatch RTT (~10 ms), noise against the
            # 0.6-10 s builds this branch times.
            fence(fb(scene.centers, scene.radii))
            t0 = time.time()
            bvh = fb(scene.centers, scene.radii)
            fence(bvh)
            res.build_ms.append((time.time() - t0) * 1000.0)
        else:
            t0 = time.time()
            bvh = build_bvh(cnp, rnp, leaf_size=leaf)
            res.build_ms.append((time.time() - t0) * 1000.0)

        if n <= brute_limit:
            # Cap the materialized (rays, sphere-chunk) pair block at
            # 2^28 elements (~1 GB of f32 temporaries) — the reference
            # used a fixed 10k rays for the same reason (benchmark.c:289).
            # nb (the ray count actually timed) is recorded per point and
            # the scaled result marked as an extrapolation (ADVICE r3).
            nb = num_rays
            while nb > 2048 and nb * min(n, CHUNK) > (1 << 28):
                nb //= 2
            rb = Ray(origin=rays.origin[:nb], direction=rays.direction[:nb])
            dt = time_chained(lambda o: brute_fn(
                Ray(origin=o, direction=rb.direction), scene), rb.origin)
            res.brute_s.append(dt * (num_rays / nb))
            res.brute_nb.append(nb)
        else:
            res.brute_s.append(float("nan"))
            res.brute_nb.append(0)

        if use_pallas and n <= dense_limit:
            # Small scenes (VERDICT r4 task 3): the hierarchical pipeline's
            # fixed cost (sort + bucket + tables) dwarfs what it saves; the
            # dense scalar-decomposed sweep measures ~127 Mrays/s at 1k
            # spheres on v5e where the hybrid's floor alone is ~16 ms.
            from tracer.intersect.brute import brute_t_fast
            fn3 = jax.jit(lambda o, dd, cc, rr: brute_t_fast(o, dd, cc, rr))
            dt = time_chained(fn3, rays.origin, rays.direction,
                              scene.centers, scene.radii)
            res.row_paths.append("dense_brute_fast")
        elif use_pallas:
            tables = build_cone_tables(scene, bvh)
            if n > brute_limit:
                # Free the device scene arrays (1.6 GB at 100M): brute is
                # skipped at this size and the query reads only the packed
                # tables; every HBM byte matters next to the 6.4 GB table.
                scene = None
            sp, s_ = 128, 8
            # Group budget scales with leaf density: a truncated refine
            # forces whole (subpacket, chunk) rows into group-mode walks.
            mg = 64 if n <= 300_000 else (128 if n <= 3_000_000 else 256)
            C = tables.cull.num_chunks
            if C > 1:
                # Multi-chunk scenes route through the TLAS level
                # (tracer/kernels/tlas.py): only live (chunk, g-block)
                # pairs exist in phase A, the kernel grid, and memory.
                # Budgets grow with chunk count (deeper corridors cross
                # more chunks); overflow is recorded per row.
                from tracer.kernels.tlas import (nearest_hit_tlas_feats,
                                                 nearest_hit_tlas_split)
                g_est = (num_rays + 256 * sp) // (s_ * sp) + 1
                # Budgets from tools/diag_tlas.py at 512k origin rays:
                #   10M  (C=157):  total pairs 38.4x g, chunks/g-block max 103
                #   100M (C=1421): total pairs 90.1x g, chunks/g-block max 502
                # (origin rays see every chunk stacked along the axis).
                if C <= 32:
                    pair_mult, kcap, pblk = 24, 48, 8192
                elif C <= 256:
                    pair_mult, kcap, pblk = 40, 128, 8192
                else:
                    pair_mult, kcap, pblk = 144, 512, 4096
                npairs = min(C * g_est, max(4096, pair_mult * g_est))
                kcap = min(C, kcap)
                if C > 32:
                    mg = 32   # per-CHUNK group budget (not the global one)

                # C > 256: the fused program crashes the remote compile
                # helper; run the same pipeline as separate jits (timed as
                # a whole, nothing excluded).
                split_jits = C > 256
                tlas_fn = (nearest_hit_tlas_split if split_jits
                           else nearest_hit_tlas_feats)

                def oneshot(o, dd, tb, mg=mg, npairs=npairs, kcap=kcap,
                            pblk=pblk):
                    feats, dest = prep_feats_bucketed(o, dd, s_, sp,
                                                      cell_bits=8)
                    t, slot, ovf = tlas_fn(
                        feats, tb, max_groups=mg, max_candidates=119,
                        npairs=npairs, kc=kcap, pair_block=pblk)
                    return t, kernel_order_dest(dest, s_, sp), ovf
            else:
                split_jits = False

                def oneshot(o, dd, tb, mg=mg):
                    feats, dest = prep_feats_bucketed(o, dd, s_, sp,
                                                      cell_bits=8)
                    t, slot, ovf = nearest_hit_hybrid_feats(
                        feats, tb, max_groups=mg, max_candidates=119)
                    return t, kernel_order_dest(dest, s_, sp), ovf

            # Tables are ARGUMENTS, not closure constants: closed-over
            # arrays are baked into the HLO, and a 10M-sphere table
            # (640 MB) blows the remote-compile request limit.
            # At C > 256 oneshot composes separately-jitted stages and
            # must NOT be re-wrapped into one program (prep is jitted
            # inside nearest_hit_tlas_split's callees or below).
            if split_jits:
                prep_j = jax.jit(lambda o, dd: prep_feats_bucketed(
                    o, dd, s_, sp, cell_bits=8))
                kod_j = jax.jit(lambda dest: kernel_order_dest(dest, s_, sp))

                def fn2(o, dd, tb, mg=mg, npairs=npairs, kcap=kcap,
                        pblk=pblk):
                    feats, dest = prep_j(o, dd)
                    t, slot, ovf = nearest_hit_tlas_split(
                        feats, tb, max_groups=mg, max_candidates=119,
                        npairs=npairs, kc=kcap, pair_block=pblk)
                    return t, kod_j(dest), ovf
            else:
                fn2 = jax.jit(oneshot)
            out = fn2(rays.origin, rays.direction, tables)
            ovf = bool(np.asarray(out[-1]))
            if ovf:
                log(f"n={n}: budget overflow on the routed path "
                    "(results conservative-degraded); recorded as-is")
            # END-TO-END: prep + cull + kernel in one jit; padded-batch
            # time IS the cost of the num_rays real rays (padding slots
            # replicate real rays); no renormalization.
            dt = time_chained(
                lambda o, dd, tb: fn2(o, dd, tb),
                rays.origin, rays.direction, tables)
            res.row_paths.append(
                ("tlas_routed" if C > 1 else path)
                + ("_lbvh" if device_build else "")
                + ("_overflow" if ovf else ""))
        else:
            rs, _ = sort_rays_by_direction(rays)
            fn = jax.jit(lambda r, s, b: nearest_hit_bvh(r, s, b).t)
            dt = time_chained(lambda o, s, b: fn(
                Ray(origin=o, direction=rs.direction), s, b),
                rs.origin, scene, bvh)
            res.row_paths.append(path)
        res.bvh_s.append(dt)
        log(f"n={n}: build {res.build_ms[-1]:.0f} ms, "
            f"brute {res.brute_s[-1]:.4f} s, bvh {res.bvh_s[-1]:.4f} s "
            f"({res.mrays_bvh()[-1]:.1f} Mrays/s)")

    return res


def plot_sweep(res: SweepResult, path: str) -> None:
    """The gnuplot replacement (src/benchmark.c:90-136): log-log BVH vs
    brute timing plot."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    n = np.asarray(res.sizes)
    ax.plot(n, res.brute_s, "o-", label="brute force O(n)")
    ax.plot(n, res.bvh_s, "s-", label="SAH BVH")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("spheres")
    ax.set_ylabel(f"seconds / {res.num_rays} rays")
    ax.set_title("BVH vs brute-force closest hit (TPU)")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
