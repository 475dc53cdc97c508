from tracer.scene.scene import Scene, random_scene, benchmark_scene, fixed_scene
from tracer.scene.camera import Camera, camera_rays, pixel_uv

__all__ = [
    "Scene",
    "random_scene",
    "benchmark_scene",
    "fixed_scene",
    "Camera",
    "camera_rays",
    "pixel_uv",
]
