"""Brute-force closest hit over all spheres: the permanent correctness oracle.

Reference: the ``bvh == NULL`` path of ``trace_ray`` (src/renderer.c:36-44), a
per-ray linear scan. Here it is one dense (B, N) computation -- all rays vs
all spheres -- reduced with argmin. Dense rank-2 elementwise work is exactly
what the TPU VPU wants, so for small scenes this path is itself very fast; it
doubles as the baseline side of the benchmark sweep (src/benchmark.c:172-223).

Tie-breaking matches the reference: the scan keeps the first strictly-smaller
t (src/renderer.c:38-42), and jnp.argmin also returns the first minimum.
"""

from __future__ import annotations

import jax.numpy as jnp

from tracer.core.types import Ray, HitRecord
from tracer.intersect.sphere import ray_sphere_t, hit_record_from_t
from tracer.scene.scene import Scene


def nearest_hit_brute(rays: Ray, scene: Scene) -> HitRecord:
    """Closest hit for a wavefront of rays, O(B*N) dense.

    rays: batch shape (...,); returns a HitRecord with the same batch shape.
    """
    batch_shape = rays.batch_shape
    o = rays.origin.reshape(-1, 1, 3)
    d = rays.direction.reshape(-1, 1, 3)
    t = ray_sphere_t(o, d, scene.centers[None, :, :], scene.radii[None, :])  # (B, N)
    idx = jnp.argmin(t, axis=-1).astype(jnp.int32)
    t_best = jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0]
    flat_rays = Ray(origin=o[:, 0, :], direction=d[:, 0, :])
    rec = hit_record_from_t(flat_rays, t_best, idx, scene.centers)
    return jtree_reshape(rec, batch_shape)


def jtree_reshape(rec: HitRecord, batch_shape) -> HitRecord:
    import jax

    def rs(x):
        return x.reshape(*batch_shape, *x.shape[1:])

    return jax.tree_util.tree_map(rs, rec)
