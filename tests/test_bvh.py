import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracer.bvh.builder import build_bvh
from tracer.bvh.flat import validate_bvh, bvh_stats
from tracer.core.types import Ray
from tracer.intersect.brute import nearest_hit_brute
from tracer.intersect.traverse import nearest_hit_bvh

_traverse = jax.jit(nearest_hit_bvh)
from tracer.scene.scene import benchmark_scene, random_scene, fixed_scene


def _rand_rays(rng, n, origin_span=0.0, center=(0.0, 0.0, 0.0)):
    d = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (np.asarray(center, np.float32)
         + rng.uniform(-origin_span, origin_span, size=(n, 3)).astype(np.float32))
    return Ray(origin=jnp.array(o), direction=jnp.array(d))


@pytest.mark.parametrize("n", [1, 2, 5, 64, 1000])
def test_builder_invariants(n):
    scene = benchmark_scene(jax.random.PRNGKey(n), n, world_size=100.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii))
    validate_bvh(bvh, np.asarray(scene.centers), np.asarray(scene.radii))


def test_builder_identical_centers_terminates():
    # All spheres at the same point: SAH cannot split; median fallback must
    # still terminate with valid leaves (reference loops to its depth cap
    # here, src/bvh.c:131).
    centers = np.zeros((33, 3), np.float32)
    radii = np.ones(33, np.float32)
    bvh = build_bvh(centers, radii, leaf_size=4)
    validate_bvh(bvh, centers, radii)
    stats = bvh_stats(bvh, 33)
    assert stats["max_depth"] < 40


@pytest.mark.parametrize("n,world", [(16, 20.0), (256, 50.0), (4096, 200.0)])
def test_bvh_equals_brute_force(rng, n, world):
    # The reference's count-matching oracle (benchmark.c:220,252) upgraded to
    # exact per-ray equality of (t, index) -- SURVEY.md section 4.
    scene = benchmark_scene(jax.random.PRNGKey(n), n, world_size=world)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii))
    rays = _rand_rays(rng, 512, origin_span=world / 4)

    ref = nearest_hit_brute(rays, scene)
    got = _traverse(rays, scene, bvh)

    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    hit = np.asarray(ref.hit)
    # t values agree to float32 tolerance (the two paths fuse the quadratic
    # differently, so bitwise equality is not expected).
    np.testing.assert_allclose(np.asarray(got.t)[hit], np.asarray(ref.t)[hit],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.index)[hit],
                                  np.asarray(ref.index)[hit])


def test_bvh_from_inside_scene(rng):
    # Rays originating inside the scene volume (the interactive-mode case).
    scene = random_scene(jax.random.PRNGKey(3), 64)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii))
    rays = _rand_rays(rng, 256, origin_span=30.0, center=(0, 0, -5))
    ref = nearest_hit_brute(rays, scene)
    got = _traverse(rays, scene, bvh)
    np.testing.assert_array_equal(np.asarray(got.index), np.asarray(ref.index))


def test_bvh_single_sphere_and_axis_parallel_rays():
    scene = fixed_scene([[0.0, 0.0, -5.0]], [1.0], [[1.0, 0.0, 0.0]])
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii))
    rays = Ray(
        origin=jnp.array([[0.0, 0.0, 0.0], [0.0, 3.0, 0.0], [0.5, 0.5, 5.0]]),
        direction=jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0], [0.0, 0.0, -1.0]]),
    )
    rec = _traverse(rays, scene, bvh)
    assert np.asarray(rec.hit).tolist() == [True, False, True]
    np.testing.assert_allclose(float(rec.t[0]), 4.0, rtol=1e-5)


def test_stats_sane():
    scene = benchmark_scene(jax.random.PRNGKey(0), 2000, world_size=100.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii))
    s = bvh_stats(bvh, 2000)
    assert s["num_leaves"] >= 2000 / bvh.leaf_size / 2
    assert 1.0 <= s["mean_leaf_occupancy"] <= bvh.leaf_size
    assert s["max_depth"] <= 45
    assert s["sah_cost"] > 0
