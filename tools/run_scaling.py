"""Measure DP scaling efficiency and write results/scaling.json.

Runs on whatever devices are visible: the 8-device virtual CPU mesh in CI
(JAX_PLATFORMS=cpu, jax_num_cpu_devices=8) or a real pod slice. VERDICT r3
task 8: commit a measured scaling artifact so the >=85% north star has a
baseline a real-pod run can extend.

usage: JAX_PLATFORMS=cpu python tools/run_scaling.py
"""
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
for k, v in (("jax_platforms", os.environ["JAX_PLATFORMS"]),
             ("jax_num_cpu_devices", 8)):
    try:
        jax.config.update(k, v)
    except Exception:
        pass

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tracer.bench.scaling import measure_scaling  # noqa: E402
from tracer.bvh.builder import build_bvh  # noqa: E402
from tracer.core.types import Ray  # noqa: E402
from tracer.intersect.traverse import nearest_hit_bvh  # noqa: E402
from tracer.scene.scene import benchmark_scene  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "scaling.json")


def main():
    n, b = 20_000, 65536
    scene = benchmark_scene(jax.random.PRNGKey(1), n, world_size=500.0)
    bvh = build_bvh(np.asarray(scene.centers), np.asarray(scene.radii),
                    leaf_size=8)
    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(origin=jnp.zeros((b, 3), jnp.float32), direction=jnp.asarray(d))

    rows = measure_scaling(scene, rays,
                           lambda r, s: nearest_hit_bvh(r, s, bvh))
    out = {
        "platform": jax.devices()[0].platform,
        "devices_total": len(jax.devices()),
        "num_spheres": n,
        "num_rays": b,
        "path": "jnp_while_loop (DP nearest_hit_sharded)",
        "note": ("virtual CPU mesh measurement: validates the sharding/"
                 "collective structure and records per-device-count "
                 "throughput; absolute numbers are CPU-bound. Real-pod "
                 "efficiency extends this file."),
        "overhead_note": (
            "work_ms/overhead_ms decompose each row via a quarter-size "
            "batch: T(n,B) = overhead(n) + work(B)/n. On a VIRTUAL mesh "
            "all n 'devices' share one host's cores, so the compute pool "
            "is constant and per-device efficiency CANNOT approach 1/n "
            "scaling by construction — the decomposition shows how much "
            "of each step is batch-proportional compute (shrinks with n "
            "only until the shared cores saturate) vs fixed "
            "partition/collective overhead (grows mildly with n). The "
            ">=85% real-pod target applies to real chips where work/n "
            "scales; overhead_ms is the term that must stay small there."),
        "rows": rows,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
