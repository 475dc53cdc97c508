"""Run the published-variant benchmark sweep on the real TPU, incrementally.

Writes results/benchmark_data.txt (+ .json + .png) after EVERY size so a
wall-clock kill loses at most one point. Mirrors the reference's published
sweep (src/benchmark.c:296, results/benchmark_data.txt) sizes up to 10M.

usage: python tools/run_sweep_tpu.py [sizes_csv] [num_rays]
"""
import json
import os
import sys

# Persistent compile cache: the sweep re-runs incrementally in fresh
# processes and every size recompiles its whole pipeline otherwise.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tracer.bench.harness import SweepResult, run_sweep, plot_sweep  # noqa: E402

SIZES = ([int(s) for s in sys.argv[1].split(",")] if len(sys.argv) > 1
         else [1000, 10_000, 100_000, 1_000_000, 10_000_000, 100_000_000])
RAYS = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results")


def main():
    os.makedirs(OUT, exist_ok=True)
    acc = None
    done = set()
    prev = os.path.join(OUT, "sweep.json")
    if os.path.exists(prev):            # resume: keep finished sizes
        with open(prev) as f:
            d = json.load(f)
        acc = SweepResult(sizes=d["sizes"], brute_s=d["brute_s"],
                          bvh_s=d["bvh_s"], build_ms=d["build_ms"],
                          num_rays=d["num_rays"], path=d["path"],
                          brute_nb=d.get("brute_nb_timed",
                                         [0] * len(d["sizes"])),
                          row_paths=d.get("row_paths",
                                          [d["path"]] * len(d["sizes"])))
        done = set(d["sizes"])
    for n in SIZES:
        if n in done:
            print(f"skip n={n} (already in sweep.json)", flush=True)
            continue
        res = run_sweep(sizes=(n,), num_rays=RAYS)
        if acc is None:
            acc = res
        else:
            acc = SweepResult(
                sizes=acc.sizes + res.sizes,
                brute_s=acc.brute_s + res.brute_s,
                bvh_s=acc.bvh_s + res.bvh_s,
                build_ms=acc.build_ms + res.build_ms,
                num_rays=RAYS, path=res.path,
                brute_nb=acc.brute_nb + res.brute_nb,
                row_paths=acc.row_paths + res.row_paths)
        acc.save_data_txt(os.path.join(OUT, "benchmark_data.txt"))
        with open(os.path.join(OUT, "sweep.json"), "w") as f:
            json.dump(acc.to_json(), f, indent=2)
        plot_sweep(acc, os.path.join(OUT, "sweep.png"))
        print(f"saved through n={n}", flush=True)
    print(json.dumps(acc.to_json()["complexity"], indent=2))


if __name__ == "__main__":
    main()
