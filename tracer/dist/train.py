"""Fully-sharded inverse-rendering training step on a 2-D device mesh.

This is the framework's "full training step" -- the analog of a DP x TP
sharded model update:

  * ``rays`` axis (DP): rays and target pixels shard; every device computes
    the loss on its ray shard; parameter gradients **psum over the ray axis**
    (the gradient all-reduce).
  * ``scene`` axis (TP): sphere arrays shard; the soft renderer's softmax
    decomposes via the streaming form -- partial max-logits **pmax over the
    scene axis**, then partial (weight*shade, weight) sums **psum over the
    scene axis** (the same online-softmax decomposition ring attention uses).
    Parameters and optimizer state stay sharded; each device updates only its
    sphere shard.

One jitted ``shard_map`` contains render + loss + backward + psum + optimizer
update, so XLA schedules the collectives against compute (ICI-overlapped).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import Array
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tracer.diff.fit import params_to_scene, scene_to_params
from tracer.diff.soft import (SoftParams, soft_accumulate, soft_finalize,
                              soft_max_logit)
from tracer.dist.mesh import RAY_AXIS, SCENE_AXIS
from tracer.scene.scene import Scene


def make_train_step(mesh: Mesh, soft: SoftParams = None, lr: float = 1e-2):
    """Build (init_fn, step_fn) for the sharded training step.

    init_fn(scene) -> (params, opt_state)   [caller shards them onto the mesh]
    step_fn(params, opt_state, ray_o, ray_d, target) -> (params, opt_state, loss)

    Shardings: params/opt_state P(scene) on the sphere dim; ray_o/ray_d/target
    P(rays) on the ray dim; loss replicated.
    """
    if soft is None:
        soft = SoftParams()
    opt = optax.adam(lr)

    def init_fn(scene: Scene):
        params = scene_to_params(scene)
        return params, opt.init(params)

    def local_step(params, opt_state, o, d, target):
        def loss_fn(params):
            scene = params_to_scene(params)
            # The shift m is stop-gradded anyway (softmax shift invariance);
            # stop it BEFORE pmax, which has no differentiation rule.
            m = jax.lax.pmax(
                jax.lax.stop_gradient(soft_max_logit(scene, o, d, soft)),
                SCENE_AXIS)
            acc, den, log_trans = soft_accumulate(scene, o, d, soft, m)
            acc, den, log_trans = jax.lax.psum((acc, den, log_trans),
                                               SCENE_AXIS)
            img = soft_finalize(acc, den, log_trans, d, soft)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # DP gradient all-reduce: sum ray-shard contributions (mean over
        # shards since each local loss is a mean over its rays).
        n = mesh.shape[RAY_AXIS]
        grads = jax.lax.psum(
            jax.tree_util.tree_map(lambda g: g / n, grads), RAY_AXIS)
        loss = jax.lax.pmean(loss, RAY_AXIS)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    param_spec = {"centers": P(SCENE_AXIS), "radii_raw": P(SCENE_AXIS),
                  "albedo_raw": P(SCENE_AXIS)}

    def step_fn_factory(opt_state_example):
        # Optimizer moments shard like the params (dim 0 = sphere dim);
        # scalar state (step count) replicates.
        ospec = jax.tree_util.tree_map(lambda leaf: P(SCENE_AXIS)
                                       if getattr(leaf, "ndim", 0) > 0 else P(),
                                       opt_state_example)
        return jax.jit(shard_map(
            local_step, mesh=mesh,
            in_specs=(param_spec, ospec, P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
            out_specs=(param_spec, ospec, P()),
        ))

    return init_fn, step_fn_factory
