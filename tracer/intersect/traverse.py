"""Stackless wavefront BVH traversal in pure JAX (the portable path).

The reference traverses its pointer tree with per-ray recursion, visiting
*both* children unconditionally and min-merging the results
(``ray_bvh_intersect``, src/hit.c:91-109). Here every ray in the wavefront
carries a single integer cursor into the escape-indexed preorder layout
(tracer/bvh/flat.py) and the whole batch advances in lock-step inside one
``lax.while_loop``:

    step: gather the per-ray node row -> slab test -> (leaf? test its
    leaf_size spheres, masked) -> cursor := hit ? node+1 : escape[node]

Two pure-win changes vs the reference, both result-preserving:
  - best-t pruning: a subtree whose box interval starts at tmin >= t_best
    cannot contain a closer hit (every primitive lies inside the box), so it
    is skipped. The reference never prunes (src/hit.c:102-103).
  - every sphere in a leaf is tested, fixing src/hit.c:98-99.

Rays that finish (cursor == M) idle as masked lanes until the whole batch is
done; the loop trip count is the *max* visited-node count over the batch.
This is the reference implementation for the Pallas megakernel
(tracer/kernels/) and the fallback on backends without Pallas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from tracer.core.types import Ray, HitRecord
from tracer.bvh.flat import FlatBVH, padded_scene_arrays
from tracer.intersect.aabb import ray_aabb_interval, safe_inv_dir
from tracer.intersect.sphere import ray_sphere_t, hit_record_from_t, EPSILON
from tracer.scene.scene import Scene


def traverse_flat(o: Array, d: Array, node_min: Array, node_max: Array,
                  escape: Array, leaf_start: Array, prim_idx: Array,
                  centers_p: Array, radii_p: Array, leaf_size: int):
    """Array-level stackless traversal core: flat (B, 3) rays against flat
    BVH tables, returning (t_best (B,), idx_best (B,)).

    ``centers_p``/``radii_p`` are sentinel-padded scene arrays
    (tracer/bvh/flat.py padded_scene_arrays); ``prim_idx`` may contain the
    sentinel slot. Exposed separately from :func:`nearest_hit_bvh` so
    shard-local BVHs can run inside ``shard_map`` (tracer/dist/ring.py).
    """
    B = o.shape[0]
    M = node_min.shape[0]
    L = leaf_size

    inv_d = safe_inv_dir(d)

    def cond(state):
        node, _, _ = state
        return jnp.any(node < M)

    def body(state):
        node, t_best, idx_best = state
        nn = jnp.minimum(node, M - 1)          # clamp finished lanes
        active = node < M

        bmin = node_min[nn]                    # (B, 3) gather
        bmax = node_max[nn]
        tmin, tmax = ray_aabb_interval(o, inv_d, bmin, bmax)
        # Reference acceptance (src/hit.c:81) + result-preserving pruning.
        box_hit = (tmax >= tmin) & (tmax > EPSILON) & (tmin < t_best) & active

        lstart = leaf_start[nn]                # (B,) gather
        is_leaf = lstart >= 0

        # Leaf test: the node's leaf_size primitive slots, masked.
        slot = jnp.maximum(lstart, 0)[:, None] + jnp.arange(L)[None, :]
        pid = prim_idx[slot]                   # (B, L) gather
        t = ray_sphere_t(o[:, None, :], d[:, None, :],
                         centers_p[pid], radii_p[pid])       # (B, L)
        t = jnp.where((box_hit & is_leaf)[:, None], t, jnp.inf)
        j = jnp.argmin(t, axis=1)
        t_leaf = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
        better = t_leaf < t_best
        t_best = jnp.where(better, t_leaf, t_best)
        idx_best = jnp.where(
            better, jnp.take_along_axis(pid, j[:, None], axis=1)[:, 0], idx_best)

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, nn + 1, escape[nn])
        node = jnp.where(active, nxt, M)
        return node, t_best, idx_best

    # Inits derive from the ray arrays so that under shard_map they carry the
    # same varying-axis type as the body outputs (a fresh jnp.zeros would be
    # replicated-typed and fail while_loop's carry check).
    zero = (o[:, 0] * 0.0).astype(jnp.int32)
    init = (
        zero,
        o[:, 0] * 0.0 + jnp.inf,
        zero - 1,
    )
    _, t_best, idx_best = jax.lax.while_loop(cond, body, init)
    return t_best, idx_best


def nearest_hit_bvh(rays: Ray, scene: Scene, bvh: FlatBVH) -> HitRecord:
    """Closest hit via stackless BVH traversal; batch shape preserved."""
    batch_shape = rays.batch_shape
    o = rays.origin.reshape(-1, 3)
    d = rays.direction.reshape(-1, 3)
    centers_p, radii_p = padded_scene_arrays(scene.centers, scene.radii)
    t_best, idx_best = traverse_flat(
        o, d, bvh.node_min, bvh.node_max, bvh.escape, bvh.leaf_start,
        bvh.prim_idx, centers_p, radii_p, bvh.leaf_size)

    flat = Ray(origin=o, direction=d)
    rec = hit_record_from_t(flat, t_best, idx_best, scene.centers)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(*batch_shape, *x.shape[1:]), rec)
