import jax
import jax.numpy as jnp
import numpy as np

from tracer.config import TracerConfig
from tracer.core.types import Ray
from tracer.integrator.wavefront import sky_color, trace_radiance, render, Accumulator
from tracer.intersect.brute import nearest_hit_brute
from tracer.scene.camera import Camera
from tracer.scene.scene import fixed_scene, random_scene

from tests import reference_oracle as ref


def test_sky_matches_reference_gradient(rng):
    d = rng.uniform(-1, 1, size=(32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    got = np.asarray(sky_color(jnp.array(d)))
    for i in range(32):
        np.testing.assert_allclose(got[i], ref.sky(d[i]), rtol=1e-5)


def test_depth1_radiance_is_albedo_or_sky():
    scene = fixed_scene([[0.0, 0.0, -5.0]], [1.0], [[0.2, 0.4, 0.6]])
    rays = Ray(
        origin=jnp.zeros((2, 3)),
        direction=jnp.array([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0]]),
    )
    nearest = lambda r: nearest_hit_brute(r, scene)
    out = np.asarray(trace_radiance(nearest, scene, rays, jax.random.PRNGKey(0),
                                    max_depth=1))
    np.testing.assert_allclose(out[0], [0.2, 0.4, 0.6], rtol=1e-6)
    np.testing.assert_allclose(out[1], ref.sky(np.array([0.0, 1.0, 0.0])), rtol=1e-5)


def test_single_sphere_two_bounce_formula():
    # One sphere, frontal hit: the bounce ray always escapes to the sky, so
    # L = albedo + 0.5 * sky(bounce_dir) exactly (renderer.c:56-58 + :65-70).
    # We recover bounce_dir by replaying the integrator's key schedule.
    from tracer.core import sampling

    scene = fixed_scene([[0.0, 0.0, -5.0]], [1.0], [[0.5, 0.1, 0.9]])
    rays = Ray(origin=jnp.zeros((1, 3)), direction=jnp.array([[0.0, 0.0, -1.0]]))
    key = jax.random.PRNGKey(42)
    nearest = lambda r: nearest_hit_brute(r, scene)
    out = np.asarray(trace_radiance(nearest, scene, rays, key, max_depth=2))[0]

    _, sub = jax.random.split(key)
    normal = jnp.array([[0.0, 0.0, 1.0]])
    bounce = sampling.uniform_on_hemisphere(sub, normal)
    want = np.array([0.5, 0.1, 0.9]) + 0.5 * ref.sky(np.asarray(bounce[0]))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_deep_paths_match_scalar_oracle_with_fixed_sampler(rng):
    # Force a deterministic "sampler" by making the integrator's hemisphere
    # draw irrelevant: scene of concentric shells can't be built easily, so
    # instead compare against the oracle using the *same* sampled directions,
    # extracted by monkeypatching the sampler.
    import tracer.integrator.wavefront as wf
    from tracer.core import sampling as smp

    scene = random_scene(jax.random.PRNGKey(7), 12)
    centers = np.asarray(scene.centers)
    radii = np.asarray(scene.radii)
    albedo = np.asarray(scene.albedo)

    n = 8
    d = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(np.array([[0.0, 4.0, 50.0]], np.float32), (n, 1))
    rays = Ray(origin=jnp.array(o), direction=jnp.array(d))

    drawn = []
    real = smp.uniform_on_hemisphere

    def recording(key, normal):
        out = real(key, normal)
        drawn.append(np.asarray(out))
        return out

    wf.sampling.uniform_on_hemisphere = recording
    try:
        with jax.disable_jit():
            nearest = lambda r: nearest_hit_brute(r, scene)
            got = np.asarray(trace_radiance(nearest, scene, rays,
                                            jax.random.PRNGKey(3), max_depth=5))
    finally:
        wf.sampling.uniform_on_hemisphere = real

    for i in range(n):
        draws = [drawn[k][i] for k in range(len(drawn))]

        class Seq:
            def __init__(self):
                self.k = 0

            def __call__(self, normal):
                v = draws[self.k]
                self.k += 1
                return v

        want = ref.trace_ray(o[i], d[i], centers, radii, albedo, 5, Seq())
        np.testing.assert_allclose(got[i], want, rtol=1e-3, atol=1e-4)


def test_render_shapes_and_range():
    cfg = TracerConfig(width=32, height=24, max_depth=3)
    scene = random_scene(jax.random.PRNGKey(0), 8)
    img = render(scene, Camera.default(), jax.random.PRNGKey(1),
                 lambda s: (lambda r: nearest_hit_brute(r, s)), cfg)
    assert img.shape == (24, 32, 3)
    a = np.asarray(img)
    assert (a >= 0).all() and (a <= 1).all()
    assert a.std() > 0.01  # not a constant image


def test_accumulator_running_mean():
    acc = Accumulator.zero(4, 4)
    f1 = jnp.full((4, 4, 3), 0.2)
    f2 = jnp.full((4, 4, 3), 0.6)
    acc = acc.reset_to(f1).add(f2)
    np.testing.assert_allclose(np.asarray(acc.mean), 0.4, rtol=1e-6)
    acc2 = acc.reset_to(f2)
    np.testing.assert_allclose(np.asarray(acc2.mean), 0.6, rtol=1e-6)


def test_compaction_preserves_radiance(rng):
    # compact=True re-sorts/parks the wavefront between bounces; per-ray math
    # is unchanged so the image must be bitwise equal with the brute oracle.
    from tracer.integrator.wavefront import bounce_noise
    cfg = TracerConfig(width=40, height=24, max_depth=4)
    scene = random_scene(jax.random.PRNGKey(2), 16)
    cam = Camera.default()
    noise = bounce_noise(jax.random.PRNGKey(3), (cfg.height, cfg.width),
                         cfg.max_depth)
    f = lambda compact: render(
        scene, cam, None, lambda s: (lambda r: nearest_hit_brute(r, s)),
        cfg, noise=noise, compact=compact)
    np.testing.assert_array_equal(np.asarray(f(False)), np.asarray(f(True)))
