from tracer.bvh.flat import FlatBVH, bvh_stats, validate_bvh
from tracer.bvh.builder import build_bvh

__all__ = ["FlatBVH", "build_bvh", "bvh_stats", "validate_bvh"]
