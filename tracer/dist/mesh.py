"""Device-mesh construction: the framework's parallelism topology.

The reference is single-threaded C with no distribution at all (SURVEY.md
section 2, parallelism inventory); this module is where the TPU-native design
adds it. Two mesh axes cover the framework's parallel strategies:

  * ``rays``  -- ray/tile data parallelism (the DP analog): the pixel/ray
    wavefront shards across devices, scene replicated. Embarrassingly
    parallel; collectives only appear in gradient psums.
  * ``scene`` -- scene/parameter sharding (the TP/FSDP analog): sphere arrays
    shard across devices and partial hits min-reduce across the axis (ring
    ppermute path in tracer/dist/ring.py) for scenes too large to replicate.

On multi-host pods, ``jax.distributed.initialize()`` is expected to have run;
meshes span all global devices and XLA lowers collectives onto ICI/DCN.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh
import numpy as np

RAY_AXIS = "rays"
SCENE_AXIS = "scene"


def ray_mesh(n_devices: int = None) -> Mesh:
    """1-D mesh over the ray axis (pure data parallelism)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (RAY_AXIS,))


def scene_mesh(ray_shards: int = None, scene_shards: int = None) -> Mesh:
    """2-D mesh (rays x scene) for joint ray- and scene-sharding."""
    devs = jax.devices()
    n = len(devs)
    if ray_shards is None and scene_shards is None:
        scene_shards = 2 if n % 2 == 0 and n > 1 else 1
        ray_shards = n // scene_shards
    elif ray_shards is None:
        ray_shards = n // scene_shards
    elif scene_shards is None:
        scene_shards = n // ray_shards
    grid = np.array(devs[: ray_shards * scene_shards]).reshape(
        ray_shards, scene_shards)
    return Mesh(grid, (RAY_AXIS, SCENE_AXIS))
