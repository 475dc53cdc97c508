"""BVH-sparsified differentiable (soft) rendering.

The dense soft renderer (tracer/diff/soft.py) scores every ray against
every sphere — O(B*N) forward AND backward, intractable at the BASELINE
headline size (fwd+bwd at 100k spheres). This module restricts the soft
model to each ray packet's BVH cull candidates (tracer/kernels/leafcull.py
phase A), making the differentiable path O(B*K) with K = a few hundred:

  rays --octahedral sort + bucket--> subpackets
  subpackets --hierarchical frustum cull--> <= max_leaves candidate leaves
  leaves --slot tables--> (P, K) candidate sphere ids
  depth-ordered alpha compositing over the gathered (P, SP, K) set

Exactness: a sphere outside every candidate leaf box of its subpacket has
sigma ~ sigmoid(-edge_sharpness * sdf) ~ 0 and contributes nothing to the
composite or the transmittance, so the sparse image converges to the
dense one as the cull stays conservative. Because the SOFT silhouette extends a
little past the hard radius, build the cull tables from radii inflated by
``soft_radius_scale(params)`` (a few softness widths); the equality tests
in tests/test_sparse_diff.py verify image and gradient agreement with the
dense model under that inflation.

Gradients flow to centers/radii/albedo THROUGH the gathers (gather's
transpose is scatter-add, handled by AD) and to camera pose through the
ray values; the candidate index sets themselves are piecewise constant,
exactly like the hard path's argmin indices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

from tracer.core import vecmath
from tracer.core.types import Ray
from tracer.diff.soft import SoftParams, _sigmoid, composite_sorted
from tracer.integrator.wavefront import sky_color
from tracer.kernels.leafcull import CullTables, leaf_candidates
from tracer.scene.scene import Scene


def soft_radius_scale(params: SoftParams, widths: float = 6.0) -> float:
    """Radius inflation factor so candidate leaf boxes cover the soft
    silhouette skirt: sigma at (1 + widths/sharpness) r is
    sigmoid(-widths) < 3e-3 of the edge value."""
    return 1.0 + widths / float(params.edge_sharpness)


@functools.partial(jax.jit, static_argnames=("max_groups", "max_leaves",
                                             "subpacket"))
def candidate_sphere_ids(o: Array, d: Array, tables: CullTables,
                         max_groups: int = 48, max_leaves: int = 16,
                         subpacket: int = 64):
    """Per-subpacket candidate sphere ids.

    o/d: (Bp, 3) sorted+bucket-padded rays (tracer/core/sort.py
    prep_rays_bucketed). Returns (ids (P, K) i32 with -1 padding,
    overflow () bool) where K = max_leaves * leaf_size. Single-chunk
    tables only (the fit-scale scenes this backs fit one chunk).
    """
    assert tables.num_chunks == 1, "sparse soft expects single-chunk tables"
    ls = tables.leaf_size
    lpg = tables.leaves_per_group
    k = max_leaves
    rows, overflow = leaf_candidates(o, d, tables, max_groups, k, subpacket)
    row = rows[:, 0]                                    # (P, rowlen)
    cnt = row[:, 0]
    P = row.shape[0]

    j = jnp.arange(k, dtype=jnp.int32)
    # Leaf-mode rows list leaf ids; group-mode rows (negated count) list
    # group ids whose member leaves are enumerated here, truncated to k.
    leaf_mode = (cnt >= 0)[:, None]
    ids_leaf = row[:, 1:k + 1]
    ids_group = row[:, 1 + j // lpg] * lpg + (j % lpg)
    n_eff = jnp.where(cnt >= 0, jnp.minimum(cnt, k),
                      jnp.minimum(-cnt * lpg, k))
    # Group-mode rows truncated to k member leaves lose candidates: that
    # is this path's overflow condition (phase A's flag only covers group
    # rows wider than their row budget).
    overflow = overflow | jnp.any((cnt < 0) & (-cnt * lpg > k))
    leaf_ids = jnp.where(leaf_mode, ids_leaf, ids_group)
    valid = (j[None, :] < n_eff[:, None]) & \
            (leaf_ids < tables.num_real_leaves) & (leaf_ids >= 0)
    leaf_ids = jnp.where(valid, leaf_ids, 0)

    slots = leaf_ids[:, :, None] * ls + jnp.arange(ls, dtype=jnp.int32)
    ids = tables.slot_to_sphere[slots.reshape(P, -1)]   # (P, K)
    ids = jnp.where(valid[:, :, None].repeat(ls, 2).reshape(P, -1) &
                    (ids >= 0), ids, -1)
    return ids, overflow


def _sparse_logits(centers, radii, albedo, o, d, params: SoftParams):
    """Soft coverage/shade/depth for gathered candidates.

    centers (P, K, 3), radii (P, K), albedo (P, K, 3) vs rays o/d
    (P, SP, 3). Returns sigma, t_soft (P, SP, K) and shade
    (P, SP, K, 3) — identical math to tracer/diff/soft.py
    _logits_and_shade, feeding composite_sorted.
    """
    o_b = o[:, :, None, :]                              # (P, SP, 1, 3)
    d_b = d[:, :, None, :]
    c_b = centers[:, None, :, :]                        # (P, 1, K, 3)
    oc = c_b - o_b                                      # (P, SP, K, 3)
    a = vecmath.dot(d_b, d_b)
    t_ca = vecmath.dot(oc, d_b) / jnp.maximum(a, 1e-30)
    perp2 = jnp.maximum(vecmath.dot(oc, oc) - t_ca * t_ca * a, 0.0)
    r = radii[:, None, :]
    eps2 = (params.smooth_eps * r) ** 2
    perp = jnp.sqrt(perp2 + eps2)
    sdf = (perp - r) / jnp.maximum(r, 1e-6)
    sigma = _sigmoid(-sdf * params.edge_sharpness)

    disc = r * r - perp2
    sq = jnp.sqrt(jnp.maximum(disc, 0.0) + eps2) - params.smooth_eps * r
    t_soft = t_ca - sq / jnp.sqrt(jnp.maximum(a, 1e-30))
    sigma = sigma * _sigmoid(t_soft * params.edge_sharpness)

    p = o_b + t_soft[..., None] * d_b
    n = vecmath.normalize(p - c_b)
    mirror = vecmath.reflect(jnp.broadcast_to(d_b, n.shape), n)
    shade = albedo[:, None] + 0.5 * sky_color(mirror)
    return sigma, shade, t_soft


def soft_render_sparse_packets(scene: Scene, o: Array, d: Array,
                               tables: CullTables,
                               params: SoftParams = None,
                               max_groups: int = 48, max_leaves: int = 16,
                               subpacket: int = 64):
    """Sparse soft image for sorted+padded rays, (Bp, 3) -> (Bp, 3).

    Returns (img, overflow). Rays must come from prep_rays_bucketed (use
    :func:`soft_render_sparse` for arbitrary ray order).
    """
    if params is None:
        params = SoftParams()
    ids, overflow = candidate_sphere_ids(o, d, tables, max_groups,
                                         max_leaves, subpacket)
    P, K = ids.shape
    safe = jnp.maximum(ids, 0)
    centers = scene.centers[safe]                       # (P, K, 3)
    # Padding rows keep a UNIT radius: a zero radius zeroes the smoothing
    # eps2 and puts sqrt at exactly 0, whose infinite derivative turns the
    # (weight=0) x shade product into NaN gradients for sphere 0 (the safe
    # gather target). The l/sigma masks below already erase padding rows'
    # contributions, values and gradients both.
    radii = jnp.where(ids >= 0, scene.radii[safe], 1.0)
    albedo = scene.albedo[safe]

    op = o.reshape(P, subpacket, 3)
    dp = d.reshape(P, subpacket, 3)
    sigma, shade, t_soft = _sparse_logits(centers, radii, albedo, op, dp,
                                          params)
    # Mask padding candidates out of the composite entirely (values AND
    # gradients): sigma 0 and t pushed past every real candidate.
    real = ids[:, None, :] >= 0
    sigma = jnp.where(real, sigma, 0.0)
    t_soft = jnp.where(real, t_soft, 3.0e38)

    img = composite_sorted(sigma, shade, t_soft, dp)
    return img.reshape(-1, 3), overflow


def soft_render_sparse(scene: Scene, rays: Ray, tables: CullTables,
                       params: SoftParams = None,
                       max_groups: int = 48, max_leaves: int = 16,
                       subpacket: int = 64):
    """Differentiable sparse soft image in the caller's ray order.

    Returns (img (batch..., 3), overflow). On overflow re-call with larger
    ``max_leaves`` (the candidates were clamped; the image is then an
    approximation on the affected subpackets).
    """
    from tracer.core.sort import prep_rays_bucketed
    batch_shape = rays.batch_shape
    flat = Ray(origin=rays.origin.reshape(-1, 3),
               direction=rays.direction.reshape(-1, 3))
    padded, dest = prep_rays_bucketed(flat, subpacket)
    img, overflow = soft_render_sparse_packets(
        scene, padded.origin, padded.direction, tables, params,
        max_groups, max_leaves, subpacket)
    return img[dest].reshape(*batch_shape, 3), overflow
