import jax
import jax.numpy as jnp
import numpy as np

from tracer.core.types import Ray
from tracer.intersect.sphere import ray_sphere_t
from tracer.intersect.aabb import ray_aabb_interval, safe_inv_dir
from tracer.intersect.brute import nearest_hit_brute
from tracer.scene.scene import benchmark_scene

from tests import reference_oracle as ref


def _random_rays(rng, n):
    d = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    return o, d


def test_sphere_t_matches_scalar_oracle(rng):
    o, d = _random_rays(rng, 64)
    centers = rng.uniform(-5, 5, size=(16, 3)).astype(np.float32)
    radii = rng.uniform(0.3, 2.0, size=(16,)).astype(np.float32)

    t = np.asarray(ray_sphere_t(
        jnp.array(o)[:, None, :], jnp.array(d)[:, None, :],
        jnp.array(centers)[None], jnp.array(radii)[None]))
    for i in range(8):
        for j in range(16):
            want = ref.ray_sphere_intersect(o[i], d[i], centers[j], radii[j])
            if np.isinf(want):
                assert np.isinf(t[i, j])
            else:
                np.testing.assert_allclose(t[i, j], want, rtol=1e-4)


def test_sphere_inside_misses_near_root_semantics():
    # Ray starting at the center of a sphere: near root is negative -> miss,
    # matching src/hit.c:28-29 (SURVEY.md 3.4).
    t = ray_sphere_t(jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]),
                     jnp.zeros(3), jnp.float32(1.0))
    assert np.isinf(np.asarray(t))


def test_grazing_disc_zero_is_miss():
    # disc == 0 exactly (tangent ray) is rejected: reference requires disc > 0.
    t = ray_sphere_t(jnp.array([-5.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]),
                     jnp.zeros(3), jnp.float32(1.0))
    assert np.isinf(np.asarray(t))


def test_aabb_interval_matches_scalar_oracle(rng):
    o, d = _random_rays(rng, 64)
    bmin = rng.uniform(-5, 0, size=(64, 3)).astype(np.float32)
    bmax = bmin + rng.uniform(0.1, 5, size=(64, 3)).astype(np.float32)

    inv = safe_inv_dir(jnp.array(d))
    tmin, tmax = ray_aabb_interval(jnp.array(o), inv, jnp.array(bmin), jnp.array(bmax))
    hit = np.asarray((tmax >= tmin) & (tmax > 1e-6))
    for i in range(64):
        assert hit[i] == ref.ray_aabb_intersect(o[i], d[i], bmin[i], bmax[i])


def test_aabb_zero_direction_component():
    # Axis-parallel ray: zero components must not produce NaNs and must match
    # the reference's +/-inf slab convention (src/hit.c:53-57).
    o = jnp.array([0.5, 0.5, -5.0])
    d = jnp.array([0.0, 0.0, 1.0])
    inv = safe_inv_dir(d)
    tmin, tmax = ray_aabb_interval(o, inv, jnp.zeros(3), jnp.ones(3))
    assert np.isfinite(np.asarray(tmin)) and np.isfinite(np.asarray(tmax))
    assert bool((tmax >= tmin) & (tmax > 1e-6))
    # Ray outside the slab in a zero-direction axis: must miss.
    o2 = jnp.array([2.5, 0.5, -5.0])
    tmin2, tmax2 = ray_aabb_interval(o2, inv, jnp.zeros(3), jnp.ones(3))
    assert not bool((tmax2 >= tmin2) & (tmax2 > 1e-6))


def test_brute_force_matches_per_ray_scan(rng):
    scene = benchmark_scene(jax.random.PRNGKey(0), 256, world_size=20.0)
    centers = np.asarray(scene.centers)
    radii = np.asarray(scene.radii)
    o, d = _random_rays(rng, 128)

    rec = nearest_hit_brute(Ray(origin=jnp.array(o), direction=jnp.array(d)), scene)
    for i in range(128):
        want_t, want_i = ref.nearest_hit(o[i], d[i], centers, radii)
        assert int(rec.index[i]) == want_i
        if want_i >= 0:
            np.testing.assert_allclose(float(rec.t[i]), want_t, rtol=1e-4)
            p = o[i] + want_t * d[i]
            n = (p - centers[want_i])
            n /= np.linalg.norm(n)
            np.testing.assert_allclose(np.asarray(rec.normal[i]), n,
                                       rtol=1e-3, atol=1e-4)
