"""BVH wireframe overlay: depth-colored AABB edges drawn over a render.

The reference's debug visualizer (src/bvh_visualiser.c) is self-admittedly
broken -- its hand-rolled projection (bvh_visualiser.c:16-41) disagrees with
the ray-gen camera model, so boxes don't line up with the spheres
(src/main.c:171-172, SURVEY.md section 2 item 10). Here projection is the
exact *inverse* of tracer.scene.camera.camera_rays -- same basis, same
half_width/half_height (including the double-aspect compat quirk) -- so the
overlay registers with the rendered image by construction.

Host-side NumPy: this is a debug path, not a hot path.
"""

from __future__ import annotations

import numpy as np

from tracer.config import TracerConfig, DEFAULT_CONFIG
from tracer.scene.camera import Camera

# 12 edges of a box as index pairs into the 8 corners.
_EDGES = [(0, 1), (1, 3), (3, 2), (2, 0),
          (4, 5), (5, 7), (7, 6), (6, 4),
          (0, 4), (1, 5), (2, 6), (3, 7)]


def project_points(points: np.ndarray, camera: Camera,
                   config: TracerConfig = DEFAULT_CONFIG):
    """World points (..., 3) -> (x_px, y_px, in_front) exactly inverting
    camera_rays' pixel->direction mapping (src/ray.c:17-32 + main.c:362-365)."""
    f, r, u = (np.asarray(v) for v in camera.basis())
    pos = np.asarray(camera.position)
    fov_rad = float(camera.fov) * np.pi / 180.0
    half_h = np.tan(fov_rad / 2.0)
    half_w = config.aspect_ratio * half_h

    v = np.asarray(points) - pos
    a = v @ r
    b = v @ u
    c = v @ f
    in_front = c > 1e-6
    c_safe = np.where(in_front, c, 1.0)
    uu = a / (c_safe * 2.0 * half_w)
    vv = b / (c_safe * 2.0 * half_h)
    if config.double_aspect_compat:
        uu = uu / config.aspect_ratio
    x = (uu + 0.5) * config.width
    y = (0.5 - vv) * config.height
    return x, y, in_front


def _draw_line(img: np.ndarray, x0, y0, x1, y1, color):
    """Sampled line draw (host debug path)."""
    h, w = img.shape[:2]
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) + 1
    xs = np.linspace(x0, x1, n).astype(int)
    ys = np.linspace(y0, y1, n).astype(int)
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[ok], xs[ok]] = color


def _depth_color(depth: int, max_depth: int):
    """Depth-keyed color ramp (the reference colors by depth too,
    src/bvh_visualiser.c:103-106): red at the root -> blue at the leaves."""
    t = min(depth / max(max_depth, 1), 1.0)
    return np.array([1.0 - t, 0.2 + 0.6 * abs(0.5 - t), t], np.float32)


def draw_bvh_wireframe(image: np.ndarray, bvh, camera: Camera,
                       config: TracerConfig = DEFAULT_CONFIG,
                       max_draw_depth: int = 8) -> np.ndarray:
    """Overlay BVH node boxes (down to max_draw_depth) on ``image`` (H,W,3
    float in [0,1]); returns a copy."""
    img = np.array(image, np.float32, copy=True)
    node_min = np.asarray(bvh.node_min)
    node_max = np.asarray(bvh.node_max)
    escape = np.asarray(bvh.escape)

    # Preorder depth via open-subtree stack (tracer/bvh/flat.py bvh_stats).
    m = len(escape)
    depths = np.zeros(m, np.int32)
    open_subtrees: list[int] = []
    for i in range(m):
        while open_subtrees and i >= open_subtrees[-1]:
            open_subtrees.pop()
        depths[i] = len(open_subtrees)
        open_subtrees.append(int(escape[i]))

    for i in range(m):
        if depths[i] > max_draw_depth:
            continue
        lo, hi = node_min[i], node_max[i]
        corners = np.array([[lo[0], lo[1], lo[2]],
                            [hi[0], lo[1], lo[2]],
                            [lo[0], hi[1], lo[2]],
                            [hi[0], hi[1], lo[2]],
                            [lo[0], lo[1], hi[2]],
                            [hi[0], lo[1], hi[2]],
                            [lo[0], hi[1], hi[2]],
                            [hi[0], hi[1], hi[2]]], np.float32)
        x, y, ok = project_points(corners, camera, config)
        color = _depth_color(int(depths[i]), max_draw_depth)
        for a, b in _EDGES:
            if ok[a] and ok[b]:
                _draw_line(img, x[a], y[a], x[b], y[b], color)
    return np.clip(img, 0.0, 1.0)
