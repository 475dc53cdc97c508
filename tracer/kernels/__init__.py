from tracer.kernels.traverse_pallas import (
    PackedBVH,
    pack_bvh,
    nearest_hit_bvh_pallas,
)

__all__ = ["PackedBVH", "pack_bvh", "nearest_hit_bvh_pallas"]
