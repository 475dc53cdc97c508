"""Sanitizer wiring tests (SURVEY.md §5, VERDICT r4 task 8).

Covers tracer/debug.py: the TRACER_DEBUG env switch, and the checkify
wrappers around the traversal and the integrator — both that they pass on
clean inputs and that they actually CATCH poisoned ones.
"""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracer.bvh.builder import build_bvh
from tracer.config import TracerConfig
from tracer.core.types import Ray
from tracer.debug import checked_nearest_hit, checked_render
from tracer.integrator.wavefront import bounce_noise
from tracer.intersect.traverse import nearest_hit_bvh
from tracer.scene.camera import Camera
from tracer.scene.scene import benchmark_scene


@pytest.fixture(scope="module")
def small():
    scene = benchmark_scene(jax.random.PRNGKey(3), 64, world_size=40.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=4)
    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(origin=jnp.zeros((128, 3), jnp.float32),
               direction=jnp.asarray(d))
    return scene, bvh, rays


def test_checked_nearest_hit_clean(small):
    scene, bvh, rays = small
    err, rec = jax.jit(
        lambda r, s: checked_nearest_hit(r, s, bvh))(rays, scene)
    err.throw()  # no violation on a clean scene
    ref = nearest_hit_bvh(rays, scene, bvh)
    np.testing.assert_allclose(np.asarray(rec.t), np.asarray(ref.t))


def test_checked_nearest_hit_catches_nan(small):
    scene, bvh, rays = small
    bad = rays.replace(direction=rays.direction.at[5, 0].set(jnp.nan))
    err, _ = jax.jit(
        lambda r, s: checked_nearest_hit(r, s, bvh))(bad, scene)
    with pytest.raises(Exception, match="nan"):
        err.throw()


def test_checked_render_clean(small):
    scene, bvh, _ = small
    cfg = TracerConfig(width=16, height=12, max_depth=2)
    noise = bounce_noise(jax.random.PRNGKey(1), (cfg.height, cfg.width),
                         cfg.max_depth)
    nearest_for = lambda s: (lambda r: nearest_hit_bvh(r, s, bvh))
    err, img = checked_render(scene, Camera.default(), nearest_for, cfg,
                              noise)
    err.throw()
    assert img.shape == (cfg.height, cfg.width, 3)
    assert bool(jnp.isfinite(img).all())


def test_tracer_debug_env_enables_nan_checking():
    """TRACER_DEBUG=1 makes a NaN-producing jit raise (fresh process: the
    debug_nans flag must be set before traced functions run)."""
    code = (
        "import os; os.environ['TRACER_DEBUG']='1';\n"
        "from tracer.debug import maybe_enable_debug\n"
        "assert maybe_enable_debug() == 1\n"
        "import jax, jax.numpy as jnp\n"
        "f = jax.jit(lambda x: jnp.log(x))\n"
        "try:\n"
        "    f(jnp.float32(-1.0)).block_until_ready()\n"
        "except Exception:\n"
        "    print('CAUGHT')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert "CAUGHT" in out.stdout, out.stdout + out.stderr
