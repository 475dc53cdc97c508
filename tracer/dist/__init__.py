from tracer.dist.mesh import ray_mesh, scene_mesh
from tracer.dist.shard import render_sharded, nearest_hit_sharded
from tracer.dist.ring import nearest_hit_ring

__all__ = [
    "ray_mesh",
    "scene_mesh",
    "render_sharded",
    "nearest_hit_sharded",
    "nearest_hit_ring",
]
