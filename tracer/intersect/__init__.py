from tracer.intersect.sphere import ray_sphere_t, hit_record_from_t
from tracer.intersect.brute import nearest_hit_brute
from tracer.intersect.aabb import ray_aabb_interval

__all__ = [
    "ray_sphere_t",
    "hit_record_from_t",
    "nearest_hit_brute",
    "ray_aabb_interval",
]
