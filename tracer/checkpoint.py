"""Checkpoint / resume: crash-safe persistence of optimization + render state.

The reference persists nothing but its benchmark data file (append-mode
fopen, src/benchmark.c:160-170); every interactive run regenerates the scene
from ``srand(time(NULL))`` (src/main.c:90). This framework's long-running
jobs -- inverse-rendering fits (tracer/diff/fit.py) and progressive
accumulation renders (tracer/integrator/wavefront.py Accumulator) -- instead
checkpoint their full state so a killed job resumes **bitwise identically**
(tests/test_checkpoint.py asserts this), which is also the recovery story
for multi-host elastic restarts (SURVEY.md section 5, failure detection).

Format: a single ``.npz`` holding the flattened pytree leaves in canonical
``jax.tree_util`` order plus a JSON header with user metadata. No Orbax
dependency: the state here is a handful of MB-scale arrays, and one npz file
is trivially portable and inspectable. Writes are atomic (tmp file +
``os.replace``) so a kill mid-write never corrupts the previous checkpoint.
"""

from __future__ import annotations

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path: str, tree, meta: dict | None = None) -> None:
    """Atomically persist any pytree of arrays (+ JSON-able metadata)."""
    leaves = jax.tree_util.tree_leaves(tree)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_pytree(path: str, like):
    """Load a checkpoint into the structure of ``like`` (a template pytree
    with the same treedef, e.g. a freshly initialized state).

    Returns (tree, meta). Leaf dtypes/shapes must match the template's; a
    mismatch raises ValueError naming the offending leaf.
    """
    with np.load(path) as f:
        meta = json.loads(bytes(f["__meta__"]).decode()) if "__meta__" in f \
            else {}
        template_leaves, treedef = jax.tree_util.tree_flatten(like)
        n = len(template_leaves)
        stored = [k for k in f.files if k.startswith("leaf_")]
        if len(stored) != n:
            raise ValueError(
                f"checkpoint {path} has {len(stored)} leaves, template has "
                f"{n} -- structure changed since it was written")
        leaves = []
        for i, tmpl in enumerate(template_leaves):
            arr = f[f"leaf_{i}"]
            t = np.asarray(tmpl)
            if arr.shape != t.shape or arr.dtype != t.dtype:
                raise ValueError(
                    f"leaf_{i}: checkpoint {arr.dtype}{arr.shape} vs "
                    f"template {t.dtype}{t.shape}")
            leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
