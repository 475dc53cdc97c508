"""CI coverage for the leaf-cull intersector (interpret mode on CPU).

Round-2 review flagged leafcull as written-but-unverified: no test, no
caller. This battery mirrors the other kernels' oracle — brute force on the
identical scene (the reference's own validation idea, src/benchmark.c:220,
252) upgraded to per-ray equality — across the kernel's special modes:
multi-chunk tables, group-mode fallback, budget escalation, the lite
(t, id) path, ragged tails, and the FD gradient of the recompute wrapper.
Also covers the cell-bucketed padding pre-pass (tracer/core/sort.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracer.bvh.builder import build_bvh
from tracer.core.sort import (bucket_pad_sorted, octahedral_codes,
                              sort_rays_octahedral)
from tracer.core.types import Ray
from tracer.intersect.brute import nearest_hit_brute
from tracer.kernels.leafcull import (CullTables, build_cull_tables,
                                     nearest_hit_leafcull,
                                     nearest_hit_leafcull_checked,
                                     nearest_hit_leafcull_t)
from tracer.scene.scene import benchmark_scene


def _rand_rays(rng, n, origin_span=0.0):
    d = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-origin_span, origin_span, size=(n, 3)).astype(np.float32)
    return Ray(origin=jnp.array(o), direction=jnp.array(d))


def _assert_matches_brute(got, ref, rtol=2e-4):
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(got.index)[hit],
                                  np.asarray(ref.index)[hit])
    np.testing.assert_allclose(np.asarray(got.t)[hit], np.asarray(ref.t)[hit],
                               rtol=rtol, atol=1e-5)


def _tables(scene, leaf=8, lpg=16, chunk_mb=9.0):
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=leaf)
    return build_cull_tables(scene, bvh, leaves_per_group=lpg,
                             max_chunk_bytes=int(chunk_mb * (1 << 20)))


@pytest.mark.parametrize("n,world,span,sp,nrays", [
    (512, 60.0, 0.0, 64, 1024),          # origin rays
    (2048, 120.0, 30.0, 64, 1024 + 300),  # spread origins, ragged tail
    (512, 60.0, 10.0, 128, 700),         # SP=128, ragged
])
def test_leafcull_equals_brute(rng, n, world, span, sp, nrays):
    scene = benchmark_scene(jax.random.PRNGKey(7 * n + sp), n,
                            world_size=world)
    tables = _tables(scene)
    rays = _rand_rays(rng, nrays, origin_span=span)
    sorted_rays, inv = sort_rays_octahedral(rays)

    ref = nearest_hit_brute(rays, scene)
    rec = nearest_hit_leafcull_checked(sorted_rays, scene, tables,
                                       subpacket=sp, interpret=True)
    got = jax.tree_util.tree_map(lambda x: x[inv], rec)
    _assert_matches_brute(got, ref)


def test_leafcull_multichunk_equals_single(rng):
    # Chunked tables (C > 1) must agree with the single-chunk result and
    # brute force, including the cross-chunk min-merge tie-break.
    n = 1500
    scene = benchmark_scene(jax.random.PRNGKey(11), n, world_size=80.0)
    t1 = _tables(scene, chunk_mb=9.0)
    tc = _tables(scene, chunk_mb=0.05)
    assert tc.num_chunks > 1 and t1.num_chunks == 1

    rays = _rand_rays(rng, 1024, origin_span=20.0)
    sorted_rays, inv = sort_rays_octahedral(rays)
    ref = nearest_hit_brute(rays, scene)
    for tables in (t1, tc):
        rec = nearest_hit_leafcull_checked(sorted_rays, scene, tables,
                                           subpacket=64, interpret=True)
        got = jax.tree_util.tree_map(lambda x: x[inv], rec)
        _assert_matches_brute(got, ref)


def test_leafcull_group_mode_fallback_correct(rng):
    # Tiny budgets force every subpacket into group-mode rows (negated
    # counts); the walk over whole groups must still match brute force.
    # (True overflow needs >119 groups per chunk; covered below at the
    # phase-A level where it is cheap to build.)
    n = 600
    scene = benchmark_scene(jax.random.PRNGKey(3), n, world_size=30.0)
    tables = _tables(scene)

    rays = _rand_rays(rng, 1024)  # unsorted -> wide frustums
    from tracer.kernels.leafcull import leaf_candidates
    rows, _ = leaf_candidates(rays.origin, rays.direction, tables,
                              max_groups=1, max_candidates=1, subpacket=64)
    assert (np.asarray(rows)[..., 0] < 0).any(), "expected group-mode rows"

    ref = nearest_hit_brute(rays, scene)
    got = nearest_hit_leafcull_checked(rays, scene, tables, max_groups=1,
                                       max_candidates=1, subpacket=64,
                                       interpret=True)
    _assert_matches_brute(got, ref)


def test_leafcull_overflow_flag_on_wide_group_rows(rng):
    # A chunk with more groups than a group row can hold (kg = 119) plus
    # incoherent subpackets must raise the overflow flag from phase A.
    n = 5000
    scene = benchmark_scene(jax.random.PRNGKey(23), n, world_size=25.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=2)
    tables = build_cull_tables(scene, bvh, leaves_per_group=16)
    assert tables.leaves_per_chunk // tables.leaves_per_group > 119

    from tracer.kernels.leafcull import leaf_candidates
    rays = _rand_rays(rng, 256)  # unsorted: frustums span the sphere
    _, overflow = leaf_candidates(rays.origin, rays.direction, tables,
                                  max_groups=1, max_candidates=1,
                                  subpacket=64)
    assert bool(overflow)


def test_leafcull_lite_matches_full(rng):
    n = 800
    scene = benchmark_scene(jax.random.PRNGKey(5), n, world_size=60.0)
    tables = _tables(scene)
    rays = _rand_rays(rng, 1024, origin_span=15.0)
    sorted_rays, _ = sort_rays_octahedral(rays)

    rec, ovf_full = nearest_hit_leafcull(sorted_rays, scene, tables,
                                         subpacket=64, interpret=True)
    t, sid, ovf_lite = nearest_hit_leafcull_t(sorted_rays, tables,
                                              subpacket=64, interpret=True)
    assert bool(ovf_full) == bool(ovf_lite)
    np.testing.assert_array_equal(np.asarray(sid), np.asarray(rec.index))
    hit = np.isfinite(np.asarray(rec.t))
    np.testing.assert_array_equal(np.isfinite(np.asarray(t)), hit)
    # The lite t comes from the kernel's rearranged quadratic
    # (u = bp + sqrt(disc), t = -u/a); on near-grazes the b^2-ac
    # cancellation amplifies the formulation difference vs the full
    # path's exact-brute recomputation, so the tolerance is looser here.
    np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(rec.t)[hit],
                               rtol=5e-3, atol=1e-4)


def test_leafcull_padding_leaves_not_candidates(rng):
    # ADVICE r2: inverted padding boxes pass the symmetric slab test as
    # all-space; phase A must mask them via num_real_leaves so they never
    # consume candidate budget. A scene whose leaf count is far from the
    # alignment boundary exercises this.
    n = 100  # 13 leaves at leaf_size=8, padded to an aligned multiple
    scene = benchmark_scene(jax.random.PRNGKey(17), n, world_size=30.0)
    tables = _tables(scene)
    assert tables.num_real_leaves < tables.num_leaves

    from tracer.kernels.leafcull import leaf_candidates
    rays = _rand_rays(rng, 128)
    sorted_rays, _ = sort_rays_octahedral(rays)
    o = sorted_rays.origin
    d = sorted_rays.direction
    rows, _ = leaf_candidates(o, d, tables, max_groups=tables.num_groups,
                              max_candidates=tables.leaves_per_chunk,
                              subpacket=64)
    rows = np.asarray(rows)                     # chunk-major (C, P, rowlen)
    for c in range(rows.shape[0]):
        for p in range(rows.shape[1]):
            cnt = rows[c, p, 0]
            assert cnt >= 0  # budgets maxed: no group mode
            ids = rows[c, p, 1:1 + cnt] + c * tables.leaves_per_chunk
            assert (ids < tables.num_real_leaves).all()


def test_leafcull_gradients_match_fd(rng):
    n = 64
    scene = benchmark_scene(jax.random.PRNGKey(13), n, world_size=20.0)
    tables = _tables(scene, leaf=4)
    rays = _rand_rays(rng, 512)
    sorted_rays, _ = sort_rays_octahedral(rays)

    def loss(radii):
        s2 = scene.replace(radii=radii)
        rec, _ = nearest_hit_leafcull(sorted_rays, s2, tables,
                                      max_groups=tables.num_groups,
                                      max_candidates=tables.leaves_per_chunk,
                                      subpacket=64, interpret=True)
        t = jnp.where(jnp.isfinite(rec.t), rec.t, 0.0)
        return jnp.sum(t)

    g = jax.grad(loss)(scene.radii)
    mag = np.abs(np.asarray(g))
    eps = 1e-3
    for i in np.argsort(mag)[-3:]:
        e = jnp.zeros_like(scene.radii).at[i].set(eps)
        fd = (loss(scene.radii + e) - loss(scene.radii - e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[i], float(fd),
                                   rtol=5e-2, atol=1e-4)


# ------------------------------------------------- cell-bucketed padding

def test_bucket_pad_sorted_roundtrip(rng):
    b = 1000
    rays = _rand_rays(rng, b, origin_span=5.0)
    o = rays.origin
    d = rays.direction
    codes = octahedral_codes(d)
    perm = jnp.argsort(codes)
    os_, ds_, cs_ = o[perm], d[perm], codes[perm]
    sp = 64
    op, dp, dest = bucket_pad_sorted(os_, ds_, cs_, sp, cell_bits=4)

    dest = np.asarray(dest)
    assert op.shape[0] == b + (1 << 4) * sp
    # Every real ray lands at its dest slot unchanged.
    np.testing.assert_allclose(np.asarray(op)[dest], np.asarray(os_))
    np.testing.assert_allclose(np.asarray(dp)[dest], np.asarray(ds_))
    # dest is strictly increasing (stream order preserved).
    assert (np.diff(dest) > 0).all()
    # No subpacket mixes rays from two cells.
    cells = np.asarray(cs_) >> (32 - 4)
    sub_of = dest // sp
    for i in range(1, b):
        if cells[i] != cells[i - 1]:
            assert sub_of[i] != sub_of[i - 1], \
                "cell boundary must start a new subpacket"


def test_bucket_pad_padding_replicates_prev_ray(rng):
    b = 300
    rays = _rand_rays(rng, b)
    codes = octahedral_codes(rays.direction)
    perm = jnp.argsort(codes)
    os_, ds_, cs_ = rays.origin[perm], rays.direction[perm], codes[perm]
    op, dp, dest = bucket_pad_sorted(os_, ds_, cs_, 64, cell_bits=3)
    dest = np.asarray(dest)
    opn, dpn = np.asarray(op), np.asarray(dp)
    is_pad = np.ones(opn.shape[0], bool)
    is_pad[dest] = False
    # Each padding slot equals the nearest real ray before it (or ray 0).
    src = np.clip(np.searchsorted(dest, np.arange(opn.shape[0]),
                                  side="right") - 1, 0, b - 1)
    np.testing.assert_allclose(opn, np.asarray(os_)[src])
    np.testing.assert_allclose(dpn, np.asarray(ds_)[src])
