"""Cull-path intersector tests: conservativeness of phase A, end-to-end
equality with brute force (phase B in interpreter mode), overflow escalation.
See tracer/intersect/cull.py and tracer/kernels/cull_pallas.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracer.bvh.builder import build_bvh
from tracer.core.sort import sort_rays_by_direction
from tracer.core.types import Ray
from tracer.intersect.brute import nearest_hit_brute
from tracer.intersect.cull import (
    LANES, PACKET, build_leaf_table, packet_bounds, packet_leaf_hit,
    tile_candidates)
from tracer.kernels import pack_bvh
from tracer.kernels.cull_pallas import (
    nearest_hit_cull, nearest_hit_cull_checked)
from tracer.scene.scene import benchmark_scene


def _rand_rays(rng, n, origin_span=0.0):
    d = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-origin_span, origin_span, size=(n, 3)).astype(np.float32)
    return Ray(origin=jnp.array(o), direction=jnp.array(d))


def _per_ray_slab_hit(o, d, lo, hi, eps=1e-6):
    """Reference AABB acceptance (src/hit.c:49-82) for one ray vs (L,3) boxes."""
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d == 0.0, 3.0e38, 1.0 / np.where(d == 0.0, 1.0, d))
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
    tn = np.minimum(t1, t2).max(-1)
    tf = np.maximum(t1, t2).min(-1)
    return (tf >= tn) & (tf > eps)


@pytest.mark.parametrize("n,world,span", [(256, 50.0, 0.0), (1024, 100.0, 25.0)])
def test_cull_is_conservative(rng, n, world, span):
    # Every leaf a real ray slab-hits must survive the packet-interval cull.
    scene = benchmark_scene(jax.random.PRNGKey(n), n, world_size=world)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=8)
    table = build_leaf_table(bvh)

    rays = _rand_rays(rng, 2 * PACKET, origin_span=span)
    rays, _ = sort_rays_by_direction(rays)
    o = np.asarray(rays.origin)
    d = np.asarray(rays.direction)

    got = np.asarray(packet_leaf_hit(*packet_bounds(rays.origin,
                                                    rays.direction), table))
    lo = np.asarray(table.leaf_min)
    hi = np.asarray(table.leaf_max)
    for p in range(got.shape[0]):
        want = np.zeros(lo.shape[0], bool)
        for r in range(p * PACKET, (p + 1) * PACKET):
            want |= _per_ray_slab_hit(o[r], d[r], lo, hi)
        # The scalar slab oracle also accepts inverted padding boxes as
        # all-space; the cull masks them explicitly (ADVICE r2), so only
        # real leaves participate in the conservativeness contract.
        want[table.num_leaves:] = False
        missed = want & ~got[p]
        assert not missed.any(), f"packet {p} lost leaves {np.where(missed)[0]}"


@pytest.mark.parametrize("n,world,span,leaf",
                         [(64, 20.0, 5.0, 4), (512, 60.0, 0.0, 8),
                          (2048, 120.0, 30.0, 16)])
def test_cull_equals_brute(rng, n, world, span, leaf):
    scene = benchmark_scene(jax.random.PRNGKey(7 * n), n, world_size=world)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=leaf)
    table = build_leaf_table(bvh)
    packed = pack_bvh(scene, bvh)

    rays = _rand_rays(rng, 2 * PACKET + 37, origin_span=span)  # ragged batch
    sorted_rays, inv = sort_rays_by_direction(rays)

    ref = nearest_hit_brute(rays, scene)
    rec = nearest_hit_cull_checked(sorted_rays, scene, packed, table,
                                   max_candidates=max(table.num_tiles // 2, 1),
                                   interpret=True)
    got = jax.tree_util.tree_map(lambda x: x[inv], rec)

    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(got.index)[hit],
                                  np.asarray(ref.index)[hit])
    np.testing.assert_allclose(np.asarray(got.t)[hit], np.asarray(ref.t)[hit],
                               rtol=1e-4, atol=1e-5)


def test_overflow_flag_and_escalation(rng):
    # A tiny budget must raise the overflow flag, and the checked driver must
    # still return the exact result by escalating.
    n = 512
    scene = benchmark_scene(jax.random.PRNGKey(3), n, world_size=30.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=4)
    table = build_leaf_table(bvh)
    packed = pack_bvh(scene, bvh)

    rays = _rand_rays(rng, PACKET)  # unsorted, wide packet -> many tiles
    _, _, overflow = tile_candidates(rays.origin, rays.direction, table, 1)
    assert bool(overflow)

    _, overflow2 = nearest_hit_cull(rays, scene, packed, table,
                                    max_candidates=1, interpret=True)
    assert bool(overflow2)

    ref = nearest_hit_brute(rays, scene)
    got = nearest_hit_cull_checked(rays, scene, packed, table,
                                   max_candidates=1, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(got.index)[hit],
                                  np.asarray(ref.index)[hit])
