from tracer.diff.soft import soft_render, SoftParams
from tracer.diff.fit import fit_scene, FitResult

__all__ = ["soft_render", "SoftParams", "fit_scene", "FitResult"]
