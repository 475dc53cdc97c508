from tracer.integrator.wavefront import sky_color, trace_radiance, render, Accumulator

__all__ = ["sky_color", "trace_radiance", "render", "Accumulator"]
