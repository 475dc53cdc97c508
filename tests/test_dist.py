"""Sharding tests on the virtual 8-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8; SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracer.config import TracerConfig
from tracer.core.types import Ray
from tracer.dist.mesh import ray_mesh, scene_mesh, RAY_AXIS, SCENE_AXIS
from tracer.dist.ring import nearest_hit_ring, build_sharded_bvh
from tracer.dist.shard import render_sharded, nearest_hit_sharded
from tracer.integrator.wavefront import render, bounce_noise
from tracer.intersect.brute import nearest_hit_brute
from tracer.scene.camera import Camera
from tracer.scene.scene import benchmark_scene, random_scene


def _rand_rays(rng, n, span=10.0):
    d = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-span, span, size=(n, 3)).astype(np.float32)
    return Ray(origin=jnp.array(o), direction=jnp.array(d))


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_nearest_hit_bitwise_equal(rng):
    scene = benchmark_scene(jax.random.PRNGKey(0), 128, world_size=40.0)
    rays = _rand_rays(rng, 256)
    mesh = ray_mesh()
    ref = nearest_hit_brute(rays, scene)
    got = nearest_hit_sharded(rays, scene, mesh, nearest_hit_brute)
    np.testing.assert_array_equal(np.asarray(got.index), np.asarray(ref.index))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))


def test_sharded_render_bitwise_equal():
    cfg = TracerConfig(width=32, height=16, max_depth=3)
    scene = random_scene(jax.random.PRNGKey(5), 12)
    cam = Camera.default()
    key = jax.random.PRNGKey(9)
    mesh = ray_mesh()

    noise = bounce_noise(key, (cfg.height, cfg.width), cfg.max_depth)
    ref = render(scene, cam, None,
                 lambda s: (lambda r: nearest_hit_brute(r, s)), cfg,
                 noise=noise)
    got = render_sharded(scene, cam, key, mesh, nearest_hit_brute, cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_ring_scene_sharding_equals_brute(rng):
    # 1024 spheres sharded 8 ways; ray blocks rotate the ring; result must
    # equal the single-device brute force (the TP/ring-attention analog).
    scene = benchmark_scene(jax.random.PRNGKey(1), 1024, world_size=60.0)
    rays = _rand_rays(rng, 512, span=20.0)
    mesh = ray_mesh()  # 1-D mesh; ring runs over its only axis
    ref = nearest_hit_brute(rays, scene)
    got = nearest_hit_ring(rays, scene, mesh, axis=RAY_AXIS)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    hit = np.asarray(ref.hit)
    # Accumulation order differs around the ring -> float32-level tolerance.
    np.testing.assert_allclose(np.asarray(got.t)[hit], np.asarray(ref.t)[hit],
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.index)[hit],
                                  np.asarray(ref.index)[hit])


def test_ring_bvh_scene_sharding_equals_brute(rng):
    # Per-shard BVH (BLAS) inside the ring step, at the scale VERDICT asked
    # for: >= 100k spheres over the 8-device mesh.
    n = 100_352  # divisible by 8
    scene = benchmark_scene(jax.random.PRNGKey(2), n, world_size=1000.0)
    sbvh = build_sharded_bvh(np.asarray(scene.centers),
                             np.asarray(scene.radii), num_shards=8,
                             leaf_size=8)
    rays = _rand_rays(rng, 1024, span=200.0)
    mesh = ray_mesh()
    ref = nearest_hit_brute(rays, scene)
    got = nearest_hit_ring(rays, scene, mesh, axis=RAY_AXIS, sbvh=sbvh)
    # One ray in this fixed seed grazes a sphere (f64 disc ~ 1e-7 of b^2);
    # acceptance is legitimately fusion-dependent there, so the comparison is
    # exact modulo verified grazes.
    from tests.reference_oracle import assert_matches_brute_modulo_grazes
    assert_matches_brute_modulo_grazes(got, ref, rays, scene)


def test_2d_mesh_shapes():
    mesh = scene_mesh()
    assert mesh.shape[RAY_AXIS] * mesh.shape[SCENE_AXIS] == 8
