"""CI coverage for the Pallas hot-path kernels (interpret mode on CPU).

The round-1 gap flagged by review: the flagship traversal kernel had no test
at all, and the cull kernels were tested but the hard-path gradient
(recompute wrapper) was not. These tests mirror the reference's de-facto
oracle -- brute force run on the identical scene (src/benchmark.c:220,252) --
upgraded to per-ray equality, plus finite-difference gradient checks.

Comparison semantics: hit masks and argmin indices must match brute force
exactly; t is compared with a tight tolerance rather than bitwise because
XLA fuses the same ``ray_sphere_t`` formula differently per call site (FMA
contraction), and the b^2 - 4ac cancellation amplifies that ~1 ulp input
difference to ~1e-5 relative in t.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracer.bvh.builder import build_bvh
from tracer.core.sort import sort_rays_by_direction
from tracer.core.types import Ray
from tracer.intersect.brute import nearest_hit_brute
from tracer.intersect.cull import build_leaf_table
from tracer.kernels import pack_bvh, nearest_hit_bvh_pallas
from tracer.kernels.tilecull import (
    nearest_hit_tilecull, nearest_hit_tilecull_checked, pack_prim_tiles,
    subpacket_candidates)
from tracer.kernels.traverse_pallas import PACKET
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


# ---------------------------------------------------------------- traversal

@pytest.mark.parametrize("n,world,span,n_streams,nrays", [
    (256, 50.0, 0.0, 1, PACKET + 129),          # ragged tail
    (1024, 100.0, 25.0, 2, 4 * PACKET),         # multi-packet, 2 streams
])
def test_traversal_kernel_equals_brute(rng, n, world, span, n_streams, nrays):
    scene = benchmark_scene(jax.random.PRNGKey(n), n, world_size=world)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=8)
    packed = pack_bvh(scene, bvh)

    rays = _rand_rays(rng, nrays, origin_span=span)
    sorted_rays, inv = sort_rays_by_direction(rays)

    ref = nearest_hit_brute(rays, scene)
    rec = nearest_hit_bvh_pallas(sorted_rays, scene, packed, interpret=True,
                                 n_streams=n_streams)
    got = jax.tree_util.tree_map(lambda x: x[inv], rec)
    _assert_matches_brute(got, ref)


def test_traversal_kernel_batch_shape(rng):
    # 2-D (image-like) ray batches round-trip through the packing.
    scene = benchmark_scene(jax.random.PRNGKey(5), 128, world_size=40.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii))
    packed = pack_bvh(scene, bvh)
    flat = _rand_rays(rng, 16 * 24)
    img = Ray(origin=flat.origin.reshape(16, 24, 3),
              direction=flat.direction.reshape(16, 24, 3))
    rec2 = nearest_hit_bvh_pallas(img, scene, packed, interpret=True)
    rec1 = nearest_hit_bvh_pallas(flat, scene, packed, interpret=True)
    assert rec2.t.shape == (16, 24)
    np.testing.assert_array_equal(np.asarray(rec2.t).ravel(),
                                  np.asarray(rec1.t))


def test_traversal_kernel_gradients_match_fd(rng):
    """Hard-path gradient: d(sum t)/d(centers) through the kernel's
    argmin-index + differentiable recompute, vs central finite differences.
    BASELINE metric 'grads allclose vs FD' for the non-soft path."""
    n = 64
    scene = benchmark_scene(jax.random.PRNGKey(11), n, world_size=20.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=4)
    packed = pack_bvh(scene, bvh)
    rays = _rand_rays(rng, 256)

    def loss(centers):
        s2 = scene.replace(centers=centers)
        rec = nearest_hit_bvh_pallas(rays, s2, packed, interpret=True)
        t = jnp.where(jnp.isfinite(rec.t), rec.t, 0.0)
        return jnp.sum(t)

    g = jax.grad(loss)(scene.centers)
    # FD on the spheres with the largest gradient magnitude. The interior
    # gradient is piecewise smooth: a coordinate whose FD estimate jumps
    # between step sizes crossed a visibility/argmin discontinuity, where FD
    # itself is invalid -- skip those, but require several validated coords.
    mag = np.abs(np.asarray(g)).sum(-1)
    checked = 0
    for i in np.argsort(mag)[-6:]:
        for ax in range(3):
            fds = []
            for eps in (1e-3, 5e-4):
                e = jnp.zeros_like(scene.centers).at[i, ax].set(eps)
                fds.append(float((loss(scene.centers + e)
                                  - loss(scene.centers - e)) / (2 * eps)))
            if not np.isclose(fds[0], fds[1], rtol=2e-2, atol=1e-3):
                continue  # discontinuity inside the FD stencil
            np.testing.assert_allclose(np.asarray(g)[i, ax], fds[1],
                                       rtol=5e-2, atol=1e-3)
            checked += 1
    assert checked >= 6, f"only {checked} FD-stable coordinates"


# ----------------------------------------------------------------- tilecull

@pytest.mark.parametrize("n,world,span,leaf,subpackets,nrays", [
    (64, 20.0, 5.0, 4, 8, 1024 + 57),           # ragged tail
    (512, 60.0, 0.0, 8, 8, 2 * PACKET),         # origin rays
    (2048, 120.0, 30.0, 16, 4, PACKET + 300),   # S=4, spread origins
])
def test_tilecull_equals_brute(rng, n, world, span, leaf, subpackets, nrays):
    scene = benchmark_scene(jax.random.PRNGKey(7 * n), n, world_size=world)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=leaf)
    table = build_leaf_table(bvh)
    packed = pack_bvh(scene, bvh)

    rays = _rand_rays(rng, nrays, origin_span=span)
    sorted_rays, inv = sort_rays_by_direction(rays)

    ref = nearest_hit_brute(rays, scene)
    rec = nearest_hit_tilecull_checked(
        sorted_rays, scene, packed, table,
        max_candidates=max(table.num_tiles // 2, 1),
        subpackets=subpackets, interpret=True)
    got = jax.tree_util.tree_map(lambda x: x[inv], rec)
    _assert_matches_brute(got, ref)


def test_tilecull_overflow_and_escalation(rng):
    n = 512
    scene = benchmark_scene(jax.random.PRNGKey(3), n, world_size=30.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=4)
    table = build_leaf_table(bvh)
    packed = pack_bvh(scene, bvh)

    rays = _rand_rays(rng, PACKET)  # unsorted -> wide frustums -> overflow
    _, overflow = nearest_hit_tilecull(rays, scene, packed, table,
                                       max_candidates=1, interpret=True)
    assert bool(overflow)

    ref = nearest_hit_brute(rays, scene)
    got = nearest_hit_tilecull_checked(rays, scene, packed, table,
                                       max_candidates=1, interpret=True)
    _assert_matches_brute(got, ref)


def test_tilecull_sentinels_never_hit(rng):
    # Padded prim slots and the sentinel tile must not produce hits even for
    # rays aimed straight at the origin / sentinel centers.
    scene = benchmark_scene(jax.random.PRNGKey(9), 5, world_size=10.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=4)  # 5 prims, leaf pad -> sentinel slots exist
    table = build_leaf_table(bvh)
    packed = pack_bvh(scene, bvh)
    prims = pack_prim_tiles(packed)
    assert float(prims[-1, 3, 0]) == float(np.float32(1.0e30))

    o = jnp.array([[5.0, 5.0, 5.0]] * 256, jnp.float32)
    d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)  # at the origin
    rays = Ray(origin=o, direction=d)
    ref = nearest_hit_brute(rays, scene)
    got = nearest_hit_tilecull_checked(rays, scene, packed, table,
                                       max_candidates=table.num_tiles,
                                       interpret=True)
    _assert_matches_brute(got, ref)


def test_tilecull_gradients_match_fd(rng):
    n = 64
    scene = benchmark_scene(jax.random.PRNGKey(13), n, world_size=20.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=4)
    table = build_leaf_table(bvh)
    packed = pack_bvh(scene, bvh)
    rays = _rand_rays(rng, 512)
    sorted_rays, _ = sort_rays_by_direction(rays)

    def loss(radii):
        s2 = scene.replace(radii=radii)
        rec, _ = nearest_hit_tilecull(sorted_rays, s2, packed, table,
                                      max_candidates=table.num_tiles,
                                      interpret=True)
        t = jnp.where(jnp.isfinite(rec.t), rec.t, 0.0)
        return jnp.sum(t)

    g = jax.grad(loss)(scene.radii)
    mag = np.abs(np.asarray(g))
    eps = 1e-3
    for i in np.argsort(mag)[-3:]:
        e = jnp.zeros_like(scene.radii).at[i].set(eps)
        fd = (loss(scene.radii + e) - loss(scene.radii - e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[i], float(fd),
                                   rtol=5e-2, atol=1e-3)
