from tracer.viz.wireframe import project_points, draw_bvh_wireframe

__all__ = ["project_points", "draw_bvh_wireframe"]
