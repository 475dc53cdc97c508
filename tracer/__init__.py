"""tracer: a TPU-native differentiable SAH-BVH ray tracer.

Brand-new JAX/XLA/Pallas framework with the capabilities of the reference C
project ShivangNagta/CS201_SAH-BVH_Ray_Tracer (see SURVEY.md): SoA sphere
scenes, binned-SAH flat BVH, batched wavefront path tracing, brute-force
oracle, benchmark harness, and multi-device sharding -- all differentiable.
"""

import os as _os

# Some TPU runtime plugins force the JAX platform at interpreter start,
# overriding the JAX_PLATFORMS environment variable. Restore the env var's
# documented meaning so `JAX_PLATFORMS=cpu python ...` works.
if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from tracer.config import TracerConfig, DEFAULT_CONFIG
from tracer.core.types import Ray, HitRecord
from tracer.scene import Scene, Camera, camera_rays, random_scene, benchmark_scene
from tracer.intersect import nearest_hit_brute
from tracer.integrator import render, trace_radiance, sky_color

__all__ = [
    "TracerConfig",
    "DEFAULT_CONFIG",
    "Ray",
    "HitRecord",
    "Scene",
    "Camera",
    "camera_rays",
    "random_scene",
    "benchmark_scene",
    "nearest_hit_brute",
    "render",
    "trace_radiance",
    "sky_color",
]
