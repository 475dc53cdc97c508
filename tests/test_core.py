import jax
import jax.numpy as jnp
import numpy as np

from tracer.core import vecmath, sampling


def test_normalize_zero_guard():
    v = jnp.array([[0.0, 0.0, 0.0], [3.0, 0.0, 4.0]])
    out = np.asarray(vecmath.normalize(v))
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[1], [0.6, 0.0, 0.8], rtol=1e-6)


def test_reflect_matches_formula(rng):
    v = rng.normal(size=(16, 3)).astype(np.float32)
    n = rng.normal(size=(16, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    got = np.asarray(vecmath.reflect(jnp.array(v), jnp.array(n)))
    want = v - 2.0 * (v * n).sum(-1, keepdims=True) * n
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_uniform_on_sphere_is_unit_and_covers_octants():
    key = jax.random.PRNGKey(0)
    v = np.asarray(sampling.uniform_on_sphere(key, (4096,)))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # All 8 sign octants occupied -> crude uniformity check.
    octants = (v > 0) @ np.array([1, 2, 4])
    assert len(np.unique(octants)) == 8


def test_hemisphere_sample_is_on_normal_side():
    key = jax.random.PRNGKey(1)
    normal = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (1024, 1))
    v = np.asarray(sampling.uniform_on_hemisphere(key, normal))
    assert (v[:, 1] > 0).all()
