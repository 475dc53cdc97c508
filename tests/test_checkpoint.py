"""Checkpoint/resume: atomic persistence, structural validation, and bitwise
continuation of an interrupted fit (SURVEY.md section 5, checkpoint entry)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tracer.checkpoint import save_pytree, load_pytree
from tracer.config import TracerConfig
from tracer.diff.fit import fit_scene
from tracer.diff.soft import SoftParams
from tracer.integrator.wavefront import Accumulator
from tracer.scene.camera import Camera
from tracer.scene.scene import random_scene


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6).reshape(2, 3),
            "b": (jnp.float32(2.5), jnp.ones((4,), jnp.int32)),
            "acc": Accumulator.zero(4, 6).add(jnp.ones((4, 6, 3)))}
    p = str(tmp_path / "ck.npz")
    save_pytree(p, tree, meta={"step": 7, "losses": [1.0, 0.5]})
    got, meta = load_pytree(p, jax.tree_util.tree_map(jnp.zeros_like, tree))
    assert meta["step"] == 7 and meta["losses"] == [1.0, 0.5]
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_rejects_shape_mismatch(tmp_path):
    p = str(tmp_path / "ck.npz")
    save_pytree(p, {"a": jnp.ones((3,))})
    with pytest.raises(ValueError, match="leaf_0"):
        load_pytree(p, {"a": jnp.ones((4,))})
    with pytest.raises(ValueError, match="structure changed"):
        load_pytree(p, {"a": jnp.ones((3,)), "b": jnp.ones((3,))})


def test_optimizer_state_roundtrip(tmp_path):
    # optax's nested namedtuple states survive the leaf-order round trip.
    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}
    opt = optax.adam(1e-2)
    state = opt.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    _, state = opt.update(g, state)
    p = str(tmp_path / "opt.npz")
    save_pytree(p, state)
    got, _ = load_pytree(p, opt.init(params))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_resume_is_bitwise(tmp_path):
    """Kill-and-resume: 6 straight steps == 3 steps + crash + resume to 6."""
    cfg = TracerConfig(width=24, height=18, max_depth=2)
    key = jax.random.PRNGKey(0)
    target_scene = random_scene(key, 4)
    camera = Camera.default()
    from tracer.diff.soft import soft_render
    target = soft_render(target_scene, camera, SoftParams(), cfg)
    init = random_scene(jax.random.PRNGKey(1), 4)

    full = fit_scene(target, init, camera, steps=6, config=cfg)

    ck = str(tmp_path / "fit.npz")
    fit_scene(target, init, camera, steps=3, config=cfg,
              checkpoint_path=ck, checkpoint_every=100)  # final save at 3
    assert os.path.exists(ck)
    resumed = fit_scene(target, init, camera, steps=6, config=cfg,
                        checkpoint_path=ck, resume=True)

    np.testing.assert_array_equal(np.asarray(full.losses[3:]),
                                  np.asarray(resumed.losses[3:]))
    np.testing.assert_array_equal(np.asarray(full.scene.centers),
                                  np.asarray(resumed.scene.centers))
    np.testing.assert_array_equal(np.asarray(full.scene.radii),
                                  np.asarray(resumed.scene.radii))
    np.testing.assert_array_equal(np.asarray(full.scene.albedo),
                                  np.asarray(resumed.scene.albedo))
