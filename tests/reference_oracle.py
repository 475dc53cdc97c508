"""Scalar NumPy re-implementation of the reference C semantics.

This is the parity fixture described in SURVEY.md section 4: a tiny, obviously-
correct float re-execution of the reference's per-ray math (src/hit.c,
src/renderer.c) used as ground truth for the vectorized JAX implementations.
Intentionally scalar and slow; used only on small inputs.
"""

from __future__ import annotations

import numpy as np

EPSILON = 1e-6


def ray_sphere_intersect(origin, direction, center, radius):
    """src/hit.c:19-39 -- near root only, disc > 0, t > EPSILON. Returns t or inf."""
    origin = np.asarray(origin, np.float32)
    direction = np.asarray(direction, np.float32)
    center = np.asarray(center, np.float32)
    oc = origin - center
    a = float(direction @ direction)
    b = 2.0 * float(oc @ direction)
    c = float(oc @ oc) - radius * radius
    disc = b * b - 4.0 * a * c
    if disc > 0:
        t = (-b - np.sqrt(disc)) / (2.0 * a)
        if t > EPSILON:
            return float(t)
    return np.inf


def ray_aabb_intersect(origin, direction, box_min, box_max):
    """src/hit.c:49-82 -- slab test with zero-direction guards."""
    tmin, tmax = -np.inf, np.inf
    for k in range(3):
        if direction[k] == 0.0:
            t1, t2 = -np.inf, np.inf
        else:
            t1 = (box_min[k] - origin[k]) / direction[k]
            t2 = (box_max[k] - origin[k]) / direction[k]
        tmin = max(tmin, min(t1, t2))
        tmax = min(tmax, max(t1, t2))
    return tmax >= tmin and tmax > EPSILON


def nearest_hit(origin, direction, centers, radii):
    """The brute-force scan of src/renderer.c:36-44: first strictly-smaller t
    wins. Returns (t, index) with (inf, -1) on miss."""
    best_t, best_i = np.inf, -1
    for i in range(len(radii)):
        t = ray_sphere_intersect(origin, direction, centers[i], radii[i])
        if t < best_t:
            best_t, best_i = t, i
    return best_t, best_i


def sky(direction):
    """src/renderer.c:65-70 in [0,1] float scale."""
    t = 0.5 * (direction[1] + 1.0)
    return np.array([
        (1.0 - t) * 1.0 + t * 128.0 / 255.0,
        (1.0 - t) * 1.0 + t * 178.0 / 255.0,
        1.0,
    ], np.float32)


def trace_ray(origin, direction, centers, radii, albedo, depth, sampler):
    """src/renderer.c:21-77 in float space (no Uint8 wrap), recursive.

    ``sampler(normal) -> direction`` injects the hemisphere sample so tests can
    fix the stochastic sequence.
    """
    if depth <= 0:
        return np.zeros(3, np.float32)
    t, i = nearest_hit(origin, direction, centers, radii)
    if i >= 0:
        point = np.asarray(origin) + t * np.asarray(direction)
        normal = point - centers[i]
        normal = normal / np.linalg.norm(normal)
        new_dir = sampler(normal)
        reflected = trace_ray(point, new_dir, centers, radii, albedo,
                              depth - 1, sampler)
        return albedo[i] + 0.5 * reflected
    return sky(direction)
