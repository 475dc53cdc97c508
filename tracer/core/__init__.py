from tracer.core import vecmath
from tracer.core.types import Ray, HitRecord
from tracer.core import sampling

__all__ = ["vecmath", "Ray", "HitRecord", "sampling"]
