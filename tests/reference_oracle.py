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


def is_graze(origin, direction, center, radius, rel=1e-5):
    """True when (ray, sphere) is a grazing contact whose f32 acceptance is
    fusion-dependent: the f64 discriminant is positive but vanishing relative
    to the cancelled b^2 term, so two valid f32 evaluation orders can land on
    opposite sides of the ``disc > 0`` rule. Used by tests to tolerate
    (only) these measure-zero flips between differently-fused pipelines."""
    o = np.asarray(origin, np.float64)
    d = np.asarray(direction, np.float64)
    c = np.asarray(center, np.float64)
    oc = o - c
    a = float(d @ d)
    b = 2.0 * float(oc @ d)
    cq = float(oc @ oc) - float(radius) ** 2
    disc = b * b - 4.0 * a * cq
    return abs(disc) <= rel * max(b * b, 1.0)


def assert_matches_brute_modulo_grazes(got, ref, rays, scene, rtol=2e-4):
    """Hit masks / argmin indices must match brute force exactly except on
    verified grazing contacts; t compared with the cancellation-aware rtol."""
    t_g = np.asarray(got.t)
    t_r = np.asarray(ref.t)
    hit_g = np.isfinite(t_g)
    hit_r = np.isfinite(t_r)
    i_g = np.asarray(got.index)
    i_r = np.asarray(ref.index)
    o = np.asarray(rays.origin).reshape(-1, 3)
    d = np.asarray(rays.direction).reshape(-1, 3)
    centers = np.asarray(scene.centers)
    radii = np.asarray(scene.radii)

    flat_g, flat_r = t_g.ravel(), t_r.ravel()
    for ray in np.where(hit_g.ravel() != hit_r.ravel())[0]:
        sid = max(int(i_g.ravel()[ray]), int(i_r.ravel()[ray]))
        assert is_graze(o[ray], d[ray], centers[sid], radii[sid]), (
            f"ray {ray}: hit-mask mismatch (sphere {sid}) is not a graze")
    both = (hit_g & hit_r).ravel()
    idx_mismatch = both & (i_g.ravel() != i_r.ravel())
    for ray in np.where(idx_mismatch)[0]:
        # Different winners are admissible only if one is a graze or the two
        # t values tie within tolerance.
        tie = np.isclose(flat_g[ray], flat_r[ray], rtol=rtol)
        gr = is_graze(o[ray], d[ray], centers[int(i_g.ravel()[ray])],
                      radii[int(i_g.ravel()[ray])]) or \
             is_graze(o[ray], d[ray], centers[int(i_r.ravel()[ray])],
                      radii[int(i_r.ravel()[ray])])
        assert tie or gr, f"ray {ray}: winner mismatch beyond tolerance"
    agree = both & (i_g.ravel() == i_r.ravel())
    np.testing.assert_allclose(flat_g[agree], flat_r[agree], rtol=rtol,
                               atol=1e-5)
