"""Ring scene-sharding: closest hit over sphere shards via ``ppermute``.

For scenes too large to replicate (the 1M-sphere multi-host config,
BASELINE config 5), sphere arrays shard across the ``scene`` mesh axis and
stay resident; *ray blocks* rotate around the ring instead. Structurally this
is ring attention's KV-rotation with the softmax-accumulate replaced by a
(t, index) min-reduction (SURVEY.md section 5, long-context entry):

    step s on device d: test resident sphere shard d against the ray block
    that originated on device (d - s) mod P, fold (t, idx) into that block's
    running best, then ppermute the block (and its running best) to d + 1.

After P steps every ray block has visited every shard and carries the global
closest hit; blocks arrive back at their home device. Per-step compute
overlaps the next permute under XLA's async collectives, and ICI carries the
ray traffic (O(rays) per step, independent of scene size).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tracer.core.types import Ray, HitRecord
from tracer.dist.mesh import SCENE_AXIS
from tracer.intersect.sphere import ray_sphere_t, hit_record_from_t
from tracer.scene.scene import Scene


def _local_best(o: Array, d: Array, centers: Array, radii: Array,
                idx_offset: Array):
    """Brute-force best (t, global index) of a ray block vs a sphere shard."""
    t = ray_sphere_t(o[:, None, :], d[:, None, :], centers[None], radii[None])
    j = jnp.argmin(t, axis=-1).astype(jnp.int32)
    tb = jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]
    return tb, j + idx_offset


def nearest_hit_ring(rays: Ray, scene: Scene, mesh: Mesh,
                     axis: str = SCENE_AXIS) -> HitRecord:
    """Closest hit with BOTH rays and spheres sharded over ``axis``.

    rays: flat batch (B, 3) fields, B divisible by the axis size;
    scene: the FULL scene (this function shards it; callers with
    already-sharded scenes can pass shard-local arrays through shard_map
    directly). Returns a HitRecord equal to the unsharded brute-force result.
    """
    p = mesh.shape[axis]
    n = scene.num_spheres
    assert n % p == 0, f"spheres {n} must divide scene shards {p}"
    shard_size = n // p

    def local(o, d, centers, radii):
        # ppermute moves data from device i to i+1; the block resident here
        # at step s originated on device (my - s). Sphere indices offset by
        # this device's shard start to produce global ids.
        my = jax.lax.axis_index(axis)
        offset = (my * shard_size).astype(jnp.int32)

        def step(carry, _):
            o_blk, d_blk, tb, ib = carry
            t_new, i_new = _local_best(o_blk, d_blk, centers, radii, offset)
            better = t_new < tb
            tb = jnp.where(better, t_new, tb)
            ib = jnp.where(better, i_new, ib)
            perm = [(i, (i + 1) % p) for i in range(p)]
            o_blk, d_blk, tb, ib = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, axis, perm),
                (o_blk, d_blk, tb, ib))
            return (o_blk, d_blk, tb, ib), None

        tb0 = jax.lax.pvary(jnp.full(o.shape[0], jnp.inf, jnp.float32),
                            (axis,))
        ib0 = jax.lax.pvary(jnp.full(o.shape[0], -1, jnp.int32), (axis,))
        (o_blk, d_blk, tb, ib), _ = jax.lax.scan(
            step, (o, d, tb0, ib0), None, length=p)
        # After p rotations each block is back home with the global best.
        return tb, ib

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        )
    o = rays.origin.reshape(-1, 3)
    d = rays.direction.reshape(-1, 3)
    tb, ib = fn(o, d, scene.centers, scene.radii)
    tb = jnp.where(ib >= 0, tb, jnp.inf)
    rec = hit_record_from_t(Ray(origin=o, direction=d), tb, ib, scene.centers)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(*rays.batch_shape, *x.shape[1:]), rec)
