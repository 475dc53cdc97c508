"""Ray/tile data parallelism via ``shard_map`` (the DP strategy).

The frame's wavefront shards across the ``rays`` mesh axis; the scene (and
BVH tables, when used) replicate -- they are the "parameters". Each device
traces its strip of pixels independently; there is no communication in the
forward pass at all, and gradient reductions (tracer/diff) ride a single psum.

Sharded rendering is bitwise-identical to single-device rendering because the
bounce noise is pre-drawn and sharded along with the rays (see
integrator.bounce_noise) -- the test suite asserts this on the virtual
8-device CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tracer.config import TracerConfig, DEFAULT_CONFIG
from tracer.core.types import Ray, HitRecord
from tracer.dist.mesh import RAY_AXIS
from tracer.integrator.wavefront import trace_radiance, bounce_noise
from tracer.scene.camera import Camera, camera_rays, pixel_uv
from tracer.scene.scene import Scene


def nearest_hit_sharded(rays: Ray, scene: Scene, mesh: Mesh,
                        nearest_hit: Callable) -> HitRecord:
    """Closest hit with rays sharded over the mesh's ray axis (leading batch
    dim must divide the axis size); scene replicated."""
    fn = shard_map(
        lambda r, s: nearest_hit(r, s),
        mesh=mesh,
        in_specs=(Ray(origin=P(RAY_AXIS), direction=P(RAY_AXIS)),
                  jax.tree_util.tree_map(lambda _: P(), scene)),
        out_specs=P(RAY_AXIS),
    )
    return fn(rays, scene)


def render_sharded(scene: Scene, camera: Camera, key: Array, mesh: Mesh,
                   nearest_hit: Callable[[Ray, Scene], HitRecord],
                   config: TracerConfig = DEFAULT_CONFIG) -> Array:
    """One frame with pixel rows sharded over the ray axis: (H, W, 3).

    H must divide by the ray-axis size. The per-bounce noise is drawn once
    globally and sharded with the rows, so the image is bitwise equal to the
    unsharded render.
    """
    h = config.height
    n = mesh.shape[RAY_AXIS]
    assert h % n == 0, f"height {h} must divide ray shards {n}"

    rays = camera_rays(camera, config)                     # (H, W, 3)
    noise = bounce_noise(key, (h, config.width), config.max_depth)

    def local(rays_l, noise_l, scene_l):
        img = trace_radiance(lambda r: nearest_hit(r, scene_l), scene_l,
                             rays_l, max_depth=config.max_depth,
                             noise=noise_l)
        return jnp.clip(img, 0.0, 1.0)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(Ray(origin=P(RAY_AXIS), direction=P(RAY_AXIS)),
                  P(None, RAY_AXIS),
                  jax.tree_util.tree_map(lambda _: P(), scene)),
        out_specs=P(RAY_AXIS),
    )
    return fn(rays, noise, scene)
