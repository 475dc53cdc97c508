"""Smoothed-visibility differentiable rendering.

The hard integrator (tracer/integrator) reproduces the reference semantics
exactly, but its pixel values depend on geometry only through *discontinuous*
visibility (which sphere the argmin picks, whether a silhouette covers a
pixel), so d(image)/d(center, radius, pose) is zero almost everywhere -- true
of the reference C tracer too, which is why inverse rendering needs the
smoothed model (BASELINE north star: "smoothed visibility for hit
boundaries").

The soft model replaces the two discontinuities:

  1. **Silhouette**: the hard hit test ``disc > 0`` becomes a sigmoid of the
     signed silhouette distance (perpendicular ray-center distance minus
     radius), giving silhouettes finite-width differentiable edges.
  2. **Occlusion**: the hard argmin over t becomes a softmax over per-sphere
     logits ``l_i = log(sigma_i) - t_i / tau_depth`` (SoftRas-style), so
     occlusion order is differentiable; the background blends in through the
     *transmittance* ``T = prod_i (1 - sigma_i)`` rather than a depth logit,
     so coverage and occlusion stay decoupled (a sphere with negligible
     silhouette coverage can never beat the sky no matter how close it is).

As ``edge_sharpness -> inf`` and ``tau_depth -> 0`` the soft image converges
to the hard depth-1 image. Everything is plain jnp over (rays, spheres), so
``jax.grad`` flows to centers, radii, albedo, AND camera pose (through ray
generation).

The softmax is computed in the standard two-pass streaming form -- a max-logit
pass then an exp-sum pass -- which decomposes exactly over sphere shards:
``pmax`` the partial maxima over the scene mesh axis, then ``psum`` the
partial (weight*shade, weight) sums (the same online-softmax decomposition
ring attention uses; tracer/dist/train.py wires it to a mesh). O(B*N) like
the brute-force oracle.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
from jax import Array

from tracer.config import TracerConfig, DEFAULT_CONFIG
from tracer.core import vecmath
from tracer.core.types import Ray
from tracer.integrator.wavefront import sky_color
from tracer.scene.camera import Camera, camera_rays
from tracer.scene.scene import Scene


@flax.struct.dataclass
class SoftParams:
    """Smoothing temperatures. edge_sharpness is in units of 1/radius (a
    sharpness of 50 => the silhouette edge is ~2% of the radius wide);
    tau_depth is in world units (occlusion softness along the ray)."""

    edge_sharpness: Array = flax.struct.field(
        default_factory=lambda: jnp.float32(50.0))
    tau_depth: Array = flax.struct.field(
        default_factory=lambda: jnp.float32(0.05))
    # Gradient-smoothing scale, relative to each sphere's radius: caps the
    # sqrt-gradient blowups at rays through a sphere's center (perp -> 0) and
    # at grazing incidence (disc -> 0), keeping AD finite and FD-matchable.
    smooth_eps: Array = flax.struct.field(
        default_factory=lambda: jnp.float32(0.05))


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(jnp.clip(-x, -30.0, 30.0)))


def _logits_and_shade(scene: Scene, o: Array, d: Array, params: SoftParams):
    """Per-(ray, sphere) occlusion logits and shaded colors.

    o, d: (B, 3). Returns l (B, N), shade (B, N, 3).
    """
    o_b = o[:, None, :]
    d_b = d[:, None, :]
    oc = scene.centers[None] - o_b                     # (B, N, 3)
    a = vecmath.dot(d_b, d_b)
    t_ca = vecmath.dot(oc, d_b) / jnp.maximum(a, 1e-30)
    perp2 = jnp.maximum(vecmath.dot(oc, oc) - t_ca * t_ca * a, 0.0)
    r = scene.radii[None]
    eps2 = (params.smooth_eps * r) ** 2
    # sqrt smoothed at the radius scale: bounded gradient even for rays
    # passing exactly through a sphere's center (perp2 -> 0).
    perp = jnp.sqrt(perp2 + eps2)
    sdf = (perp - r) / jnp.maximum(r, 1e-6)
    sigma = _sigmoid(-sdf * params.edge_sharpness)

    disc = r * r - perp2
    # Smoothed hit depth: equals t_ca - sqrt(disc) away from grazing, stays
    # smooth (bounded gradient) through disc -> 0, and equals t_ca when the
    # ray misses. The offset keeps it continuous at disc = 0.
    sq = jnp.sqrt(jnp.maximum(disc, 0.0) + eps2) - params.smooth_eps * r
    t_soft = t_ca - sq / jnp.sqrt(jnp.maximum(a, 1e-30))
    # Spheres behind the origin fade out smoothly.
    sigma = sigma * _sigmoid(t_soft * params.edge_sharpness)

    l = jnp.log(sigma + 1e-30) - t_soft / params.tau_depth   # (B, N)

    p = o_b + t_soft[..., None] * d_b
    n = vecmath.normalize(p - scene.centers[None])
    mirror = vecmath.reflect(jnp.broadcast_to(d_b, n.shape), n)
    # Deterministic analog of base + 0.5*bounce (src/renderer.c:56-58) with
    # the mirror direction (the commented-out variant at src/renderer.c:52).
    shade = scene.albedo[None] + 0.5 * sky_color(mirror)
    return l, shade, sigma


def soft_max_logit(scene: Scene, o: Array, d: Array,
                   params: SoftParams) -> Array:
    """Pass 1: per-ray max logit over this sphere shard, (B,). pmax partial
    maxima across scene shards before pass 2."""
    l, _, _ = _logits_and_shade(scene, o, d, params)
    return jnp.max(l, axis=1)


def soft_accumulate(scene: Scene, o: Array, d: Array, params: SoftParams,
                    m: Array):
    """Pass 2: partial (sum w*shade, sum w, sum log(1-sigma)) of this sphere
    shard, with w = exp(l - m); psum all three across scene shards. m is the
    per-ray global max logit (stop-gradded; the softmax is shift-invariant)."""
    l, shade, sigma = _logits_and_shade(scene, o, d, params)
    w = jnp.exp(l - jax.lax.stop_gradient(m)[:, None])
    acc = jnp.sum(w[..., None] * shade, axis=1)
    den = jnp.sum(w, axis=1)
    log_trans = jnp.sum(jnp.log1p(-sigma * (1.0 - 1e-6)), axis=1)
    return acc, den, log_trans


def soft_finalize(acc: Array, den: Array, log_trans: Array, d: Array,
                  params: SoftParams):
    """Blend the depth-softmax sphere color with the sky through the
    transmittance T = prod(1 - sigma) -> (B, 3)."""
    t_bg = jnp.exp(log_trans)[:, None]
    sky = sky_color(d)
    sphere_color = acc / (den + 1e-20)[:, None]
    img = (1.0 - t_bg) * sphere_color + t_bg * sky
    return jnp.clip(img, 0.0, 1.0)


def soft_render(scene: Scene, camera: Camera,
                params: SoftParams = None,
                config: TracerConfig = DEFAULT_CONFIG,
                rays: Ray = None) -> Array:
    """Differentiable soft image; (H, W, 3) (or rays' batch shape + (3,))."""
    if params is None:
        params = SoftParams()
    if rays is None:
        rays = camera_rays(camera, config)
    batch_shape = rays.batch_shape
    o = rays.origin.reshape(-1, 3)
    d = rays.direction.reshape(-1, 3)
    m = soft_max_logit(scene, o, d, params)
    acc, den, log_trans = soft_accumulate(scene, o, d, params, m)
    img = soft_finalize(acc, den, log_trans, d, params)
    return img.reshape(*batch_shape, 3)
