import jax.numpy as jnp
import numpy as np

from tracer.config import TracerConfig
from tracer.scene.camera import Camera, camera_rays, pixel_uv


def _ref_camera_ray(pos, yaw, pitch, fov, u, v, width, height):
    """Scalar re-implementation of src/camera.c:10-18 + src/ray.c:17-32."""
    forward = np.array([
        np.cos(pitch) * np.sin(yaw),
        np.sin(pitch),
        np.cos(pitch) * np.cos(yaw),
    ], np.float32)
    forward /= np.linalg.norm(forward)
    right = np.cross(forward, [0.0, 1.0, 0.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, forward)
    up /= np.linalg.norm(up)

    aspect = width / height
    half_height = np.tan(np.radians(fov) / 2.0)
    half_width = aspect * half_height
    direction = forward + right * 2.0 * half_width * u + up * 2.0 * half_height * v
    return pos, direction / np.linalg.norm(direction)


def test_camera_rays_match_reference_math():
    cfg = TracerConfig(width=8, height=6)
    cam = Camera.default()
    rays = camera_rays(cam, cfg)
    assert rays.origin.shape == (6, 8, 3)

    uu, vv = pixel_uv(cfg)
    for y in [0, 3, 5]:
        for x in [0, 4, 7]:
            # Reference pixel loop (src/main.c:362-365):
            u = (x / cfg.width - 0.5) * cfg.aspect_ratio
            v = (y / cfg.height - 0.5)
            _, want_dir = _ref_camera_ray(
                np.array([0, 4, 50], np.float32), -np.pi, 0.0, 45.0,
                u, -v, cfg.width, cfg.height)
            np.testing.assert_allclose(np.asarray(rays.direction[y, x]),
                                       want_dir, rtol=1e-5, atol=1e-6)


def test_default_camera_looks_down_minus_z():
    f, r, u = Camera.default().basis()
    np.testing.assert_allclose(np.asarray(f), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(r), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(u), [0, 1, 0], atol=1e-6)


def test_double_aspect_compat_flag():
    quirk = TracerConfig(width=8, height=6, double_aspect_compat=True)
    fixed = TracerConfig(width=8, height=6, double_aspect_compat=False)
    uq, _ = pixel_uv(quirk)
    uf, _ = pixel_uv(fixed)
    np.testing.assert_allclose(np.asarray(uq), np.asarray(uf) * quirk.aspect_ratio,
                               rtol=1e-6)
