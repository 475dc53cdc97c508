"""Differentiable-rendering tests: FD gradient checks and inverse rendering
(the BASELINE "grads allclose vs FD" metric)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracer.config import TracerConfig
from tracer.diff.soft import soft_render, SoftParams
from tracer.diff.fit import fit_scene
from tracer.scene.camera import Camera
from tracer.scene.scene import fixed_scene

CFG = TracerConfig(width=24, height=18, max_depth=1)


def _simple_scene():
    return fixed_scene(
        [[0.0, 4.0, 30.0], [3.0, 2.0, 28.0]],
        [2.0, 1.5],
        [[0.8, 0.2, 0.2], [0.1, 0.6, 0.9]],
    )


def _fd_grad(f, x, eps):
    """Central finite differences of scalar f at array x."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        g[i] = (f(jnp.asarray(xp, jnp.float32)) - f(jnp.asarray(xm, jnp.float32))) / (2 * eps)
        it.iternext()
    return g


@pytest.mark.parametrize("field,eps,rtol", [
    ("centers", 1e-2, 0.10),
    ("radii", 1e-2, 0.15),
    ("albedo", 1e-2, 0.05),
])
def test_soft_render_grads_match_fd(field, eps, rtol):
    scene = _simple_scene()
    cam = Camera.default()
    soft = SoftParams(edge_sharpness=jnp.float32(8.0),
                      tau_depth=jnp.float32(0.5))

    def loss_of(value):
        s = scene.replace(**{field: value})
        img = soft_render(s, cam, soft, CFG)
        return float(jnp.sum(img * jnp.linspace(0, 1, img.size).reshape(img.shape)))

    base = getattr(scene, field)
    g_fd = _fd_grad(loss_of, base, eps)

    def loss_jax(value):
        s = scene.replace(**{field: value})
        img = soft_render(s, cam, soft, CFG)
        return jnp.sum(img * jnp.linspace(0, 1, img.size).reshape(img.shape))

    g_ad = np.asarray(jax.grad(loss_jax)(base))
    assert np.isfinite(g_ad).all()
    assert np.abs(g_ad).max() > 1e-6, "gradient is identically zero"
    denom = np.abs(g_fd).max()
    np.testing.assert_allclose(g_ad, g_fd, atol=rtol * denom)


def test_camera_pose_gradient_nonzero():
    scene = _simple_scene()
    cam = Camera.default()
    soft = SoftParams(edge_sharpness=jnp.float32(8.0),
                      tau_depth=jnp.float32(0.5))

    def loss(yaw, pitch):
        img = soft_render(scene, cam.replace(yaw=yaw, pitch=pitch), soft, CFG)
        return jnp.mean((img - 0.3) ** 2)

    gy, gp = jax.grad(loss, argnums=(0, 1))(cam.yaw, cam.pitch)
    assert np.isfinite(float(gy)) and np.isfinite(float(gp))
    assert abs(float(gy)) > 1e-8 and abs(float(gp)) > 1e-8


def test_soft_converges_to_hard_silhouette():
    # As sharpness -> inf, the soft image's silhouette matches the hard
    # renderer's primary-hit mask.
    from tracer.integrator.wavefront import render
    from tracer.intersect.brute import nearest_hit_brute
    from tracer.scene.camera import camera_rays

    scene = _simple_scene()
    cam = Camera.default()
    sharp = SoftParams(edge_sharpness=jnp.float32(5000.0),
                       tau_depth=jnp.float32(0.001))
    img_soft = soft_render(scene, cam, sharp, CFG)

    rays = camera_rays(cam, CFG)
    rec = nearest_hit_brute(rays, scene)
    hard_mask = np.asarray(rec.hit)
    # Sky pixels AWAY from silhouettes: soft must equal sky (weight ~ 0).
    # Pixels grazing a silhouette legitimately differ at any finite sharpness.
    o = np.asarray(rays.origin).reshape(-1, 3)
    d = np.asarray(rays.direction).reshape(-1, 3)
    c = np.asarray(scene.centers); r = np.asarray(scene.radii)
    oc = c[None] - o[:, None]
    t_ca = (oc * d[:, None]).sum(-1)
    perp = np.sqrt(np.maximum((oc * oc).sum(-1) - t_ca ** 2, 0.0))
    rel_sdf = np.abs(perp - r[None]) / r[None]
    away = rel_sdf.min(-1).reshape(hard_mask.shape) > 0.05
    from tracer.integrator.wavefront import sky_color
    sky = np.asarray(sky_color(rays.direction))
    soft_np = np.asarray(img_soft)
    sky_px = (~hard_mask) & away
    assert sky_px.sum() > 50
    np.testing.assert_allclose(soft_np[sky_px], sky[sky_px], atol=2e-2)


def test_fit_recovers_albedo_and_position():
    # Self-consistent inverse rendering: target rendered by the same soft
    # model; perturbed init must descend and roughly recover the target image.
    target_scene = _simple_scene()
    cam = Camera.default()
    soft = SoftParams(edge_sharpness=jnp.float32(12.0),
                      tau_depth=jnp.float32(0.3))
    target = soft_render(target_scene, cam, soft, CFG)

    init = target_scene.replace(
        centers=target_scene.centers + jnp.array([[0.6, -0.4, 0.0],
                                                  [-0.5, 0.3, 0.0]]),
        albedo=jnp.clip(target_scene.albedo + 0.25, 0.05, 0.95),
    )
    res = fit_scene(target, init, cam, steps=60, lr=5e-2, soft=soft,
                    config=CFG)
    assert res.losses[-1] < res.losses[0] * 0.25, res.losses[[0, -1]]


def test_fit_sharded_matches_unsharded():
    from tracer.dist.mesh import ray_mesh
    target_scene = _simple_scene()
    cam = Camera.default()
    soft = SoftParams(edge_sharpness=jnp.float32(12.0),
                      tau_depth=jnp.float32(0.3))
    target = soft_render(target_scene, cam, soft, CFG)
    init = target_scene.replace(
        albedo=jnp.clip(target_scene.albedo + 0.2, 0.05, 0.95))

    r1 = fit_scene(target, init, cam, steps=5, lr=1e-2, soft=soft, config=CFG)
    r2 = fit_scene(target, init, cam, steps=5, lr=1e-2, soft=soft, config=CFG,
                   mesh=ray_mesh())
    np.testing.assert_allclose(r1.losses, r2.losses, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(r1.scene.centers),
                               np.asarray(r2.scene.centers), atol=1e-4)
