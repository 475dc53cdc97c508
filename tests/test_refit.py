"""On-device BVH refit: bounds track moved geometry; traversal over a
refitted tree equals brute force on the moved scene (tracer/bvh/refit.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tracer.bvh.builder import build_bvh
from tracer.bvh.flat import validate_bvh
from tracer.bvh.refit import build_refit_plan, refit_bvh
from tracer.core.types import Ray
from tracer.intersect.brute import nearest_hit_brute
from tracer.intersect.traverse import nearest_hit_bvh
from tracer.scene.scene import benchmark_scene


def _rand_rays(rng, n, span=30.0):
    d = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-span, span, size=(n, 3)).astype(np.float32)
    return Ray(origin=jnp.array(o), direction=jnp.array(d))


def test_refit_identity_matches_build(rng):
    scene = benchmark_scene(jax.random.PRNGKey(0), 777, world_size=60.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=8)
    plan = build_refit_plan(bvh)
    ref2 = refit_bvh(bvh, plan, scene.centers, scene.radii)
    # Same geometry -> same boxes (up to exact equality: both are plain
    # min/max folds over the same float32 values).
    np.testing.assert_allclose(np.asarray(ref2.node_min),
                               np.asarray(bvh.node_min), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref2.node_max),
                               np.asarray(bvh.node_max), atol=1e-5)


def test_refit_tracks_moved_geometry(rng):
    n = 600
    scene = benchmark_scene(jax.random.PRNGKey(1), n, world_size=50.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=4)
    plan = build_refit_plan(bvh)

    key = jax.random.PRNGKey(2)
    moved = scene.replace(
        centers=scene.centers + jax.random.normal(key, (n, 3)) * 2.0,
        radii=scene.radii * 1.3)
    new = jax.jit(lambda c, r: refit_bvh(bvh, plan, c, r))(
        moved.centers, moved.radii)

    # Structural invariants hold on the refitted tree...
    validate_bvh(new, np.asarray(moved.centers), np.asarray(moved.radii))
    # ...and traversal over it equals brute force on the moved scene.
    rays = _rand_rays(rng, 512)
    ref = nearest_hit_brute(rays, moved)
    got = nearest_hit_bvh(rays, moved, new)
    from tests.reference_oracle import assert_matches_brute_modulo_grazes
    assert_matches_brute_modulo_grazes(got, ref, rays, moved)


def test_refit_is_differentiable():
    # Bounds are min/max folds of centers/radii: grads flow (piecewise).
    scene = benchmark_scene(jax.random.PRNGKey(3), 64, world_size=20.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=4)
    plan = build_refit_plan(bvh)

    def root_volume(c, r):
        b = refit_bvh(bvh, plan, c, r)
        ext = b.node_max[0] - b.node_min[0]
        return ext[0] * ext[1] * ext[2]

    g = jax.grad(root_volume, argnums=1)(scene.centers, scene.radii)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
