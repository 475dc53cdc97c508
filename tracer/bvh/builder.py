"""Binned-SAH BVH construction (host-side, vectorized NumPy).

Re-design of the reference's top-down SAH build (``build_bvh_node``,
src/bvh.c:117-207) with the same split-candidate geometry -- 8 uniform planes
per axis over the node bounds (src/bvh.c:143-160), partition by sphere center
(src/bvh.c:172-201), unnormalized cost ``0.125 + Nl*SAl + Nr*SAr``
(src/bvh.c:59-97) -- but O(n * bins) per level via *binning* instead of the
reference's O(n * bins * axes) full re-sweep per candidate plane, and with two
reference bugs designed out (SURVEY.md section 7):

  1. Degenerate partitions (everything on one side) no longer recurse on the
     full range until the depth cap (src/bvh.c:131,172-201); we fall back to
     an exact median split, which always makes progress.
  2. Leaves hold up to ``leaf_size`` spheres and traversal tests *all* of
     them (the reference tests only the first: src/hit.c:98-99).

Because the output is escape-indexed preorder (tracer/bvh/flat.py),
``escape[i]`` is just ``i + subtree_size(i)`` -- each node's escape is the
node-array length right after its subtree finished emitting; no pointer
patching at all.

The build runs on host (once per scene, latency-bound); the output is the
flat SoA layout consumed by the device traversal kernels. A native C++
builder (tracer/bvh/native) covers the build-ms metric at large N, and
``tracer.bvh.refit.refit_bvh`` updates bounds on-device for differentiable
geometry without a host rebuild.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tracer.bvh.flat import FlatBVH


def _surface_area(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """2*(xy+yz+zx) of extents hi-lo; empty boxes clamp to 0 extent.
    Reference ``get_aabb_surface_area`` (src/bvh.c:48-57)."""
    d = np.maximum(hi - lo, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])


def build_bvh(centers, radii, leaf_size: int = 4, num_bins: int = 8,
              max_depth: int = 40, backend: str = "auto",
              near_point=(0.0, 0.0, 0.0)) -> FlatBVH:
    """Build a FlatBVH over spheres. centers (N,3), radii (N,) (host arrays).

    Returns device arrays (jnp); primitive indices reference the caller's
    original sphere order. backend: "auto" prefers the native C++ builder
    (tracer/bvh/native, ~100x faster at large N) and falls back to NumPy;
    "native"/"numpy" force one. near_point (native only): children are
    emitted closer-to-this-point first so DFS traversal sees near geometry
    early and best-t pruning bites (pass the camera/ray origin).
    """
    centers = np.asarray(centers, np.float32)
    radii = np.asarray(radii, np.float32)
    n = len(radii)
    if n == 0:
        raise ValueError("cannot build a BVH over an empty scene")

    if backend in ("auto", "native"):
        from tracer.bvh import native
        out = native.build_bvh_native_arrays(
            centers, radii, leaf_size=leaf_size, num_bins=num_bins,
            max_depth=max_depth, near_point=near_point)
        if out is not None:
            node_min, node_max, escape, leaf_start, prim_idx = out
            return FlatBVH(
                node_min=jnp.asarray(node_min),
                node_max=jnp.asarray(node_max),
                escape=jnp.asarray(escape),
                leaf_start=jnp.asarray(leaf_start),
                prim_idx=jnp.asarray(prim_idx),
                leaf_size=leaf_size,
            )
        if backend == "native":
            raise RuntimeError("native BVH builder unavailable (no g++?)")

    prim_lo = centers - radii[:, None]
    prim_hi = centers + radii[:, None]

    node_min: list[np.ndarray] = []
    node_max: list[np.ndarray] = []
    escape: list[int] = []
    leaf_start: list[int] = []
    prim_slots: list[np.ndarray] = []

    def sah_split(idx, lo, hi):
        """Binned SAH split; returns (left_idx, right_idx) or None if every
        candidate plane is degenerate (collapsed extent / single bin)."""
        c = centers[idx]
        best = None  # (cost, axis, plane_bin)
        for axis in range(3):
            span = float(hi[axis] - lo[axis])
            if span <= 0.0:
                continue
            t = (c[:, axis] - lo[axis]) / span
            b = np.clip((t * num_bins).astype(np.int64), 0, num_bins - 1)
            counts = np.bincount(b, minlength=num_bins)
            bin_lo = np.full((num_bins, 3), np.inf, np.float32)
            bin_hi = np.full((num_bins, 3), -np.inf, np.float32)
            np.minimum.at(bin_lo, b, prim_lo[idx])
            np.maximum.at(bin_hi, b, prim_hi[idx])
            pre_lo = np.minimum.accumulate(bin_lo, axis=0)
            pre_hi = np.maximum.accumulate(bin_hi, axis=0)
            suf_lo = np.minimum.accumulate(bin_lo[::-1], axis=0)[::-1]
            suf_hi = np.maximum.accumulate(bin_hi[::-1], axis=0)[::-1]
            n_left = np.cumsum(counts)[:-1]
            n_right = len(idx) - n_left
            sa_left = _surface_area(pre_lo[:-1], pre_hi[:-1])
            sa_right = _surface_area(suf_lo[1:], suf_hi[1:])
            # Reference cost form 0.125 + Nl*SAl + Nr*SAr (src/bvh.c:95-97);
            # empty sides contribute 0.
            cost = 0.125 + np.where(n_left > 0, n_left * sa_left, 0.0) \
                         + np.where(n_right > 0, n_right * sa_right, 0.0)
            # Only planes that actually split are usable.
            usable = (n_left > 0) & (n_right > 0)
            if not usable.any():
                continue
            cost = np.where(usable, cost, np.inf)
            k = int(np.argmin(cost))
            if best is None or cost[k] < best[0]:
                best = (float(cost[k]), axis, k)

        if best is None:
            return None
        _, axis, k = best
        span = float(hi[axis] - lo[axis])
        t = (centers[idx, axis] - lo[axis]) / span
        b = np.clip((t * num_bins).astype(np.int64), 0, num_bins - 1)
        mask = b <= k
        return idx[mask], idx[~mask]

    def median_split(idx, lo, hi):
        """Exact median split on the longest axis: always progresses."""
        axis = int(np.argmax(hi - lo))
        ordr = np.argsort(centers[idx, axis], kind="stable")
        half = max(len(idx) // 2, 1)
        return idx[ordr[:half]], idx[ordr[half:]]

    def emit(idx: np.ndarray, depth: int) -> None:
        me = len(node_min)
        node_min.append(prim_lo[idx].min(axis=0))
        node_max.append(prim_hi[idx].max(axis=0))
        escape.append(-1)
        leaf_start.append(-1)

        if len(idx) <= leaf_size:
            padded = np.full(leaf_size, n, np.int64)
            padded[:len(idx)] = idx
            leaf_start[me] = len(prim_slots) * leaf_size
            prim_slots.append(padded)
            escape[me] = me + 1
            return

        # Past the depth cap, stop paying for SAH and just bisect (the
        # escape-index layout has no stack, so extra depth is free).
        split = None if depth >= max_depth else sah_split(
            idx, node_min[me], node_max[me])
        if split is None:
            split = median_split(idx, node_min[me], node_max[me])
        left_idx, right_idx = split
        emit(left_idx, depth + 1)
        emit(right_idx, depth + 1)
        escape[me] = len(node_min)  # index right past my whole subtree

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        emit(np.arange(n), 0)
    finally:
        sys.setrecursionlimit(old_limit)

    return FlatBVH(
        node_min=jnp.asarray(np.stack(node_min)),
        node_max=jnp.asarray(np.stack(node_max)),
        escape=jnp.asarray(np.asarray(escape), jnp.int32),
        leaf_start=jnp.asarray(np.asarray(leaf_start), jnp.int32),
        prim_idx=jnp.asarray(np.concatenate(prim_slots), jnp.int32),
        leaf_size=leaf_size,
    )
