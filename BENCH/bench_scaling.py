"""Two-cluster-size scaling evidence (BASELINE.json north_rule): run the
identical full-suite bench at local[8] (N) and local[32] (4N) on the
same SF input via subprocesses (fresh JVM each, no warm-cache bias
between sizes beyond the shared parquet cache), then report throughput
at both plus scaling efficiency = (T_N / T_4N) / 4 and write
BENCH/scaling.json + refresh the Measured table in BENCH/BASELINE.md."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cores: int, sf_dir: str, n_rows: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    # suite-only (the north metric), at 4× the SF row count: with the
    # production sampled-integrity mode the suite is short enough at
    # SF=0.1 that the fixed JVM/codegen floor (~10-20 s, identical at
    # both core counts) would dominate the small leg — a scaling
    # measurement needs enough WORK per leg that the floor amortizes,
    # same as sizing a per-executor workload on a real cluster.
    env["PDVS_BENCH_SUITE_ONLY"] = "1"
    env["PDVS_BENCH_ROWS"] = str(n_rows)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_small = int(os.environ.get("PDVS_SCALE_N", "8"))
    n_big = 4 * n_small
    n_rows = int(os.environ.get("PDVS_SCALE_ROWS", "2400000"))

    small = run_at(n_small, sf_dir, n_rows)
    big = run_at(n_big, sf_dir, n_rows)

    t_small = small["value"]
    t_big = big["value"]
    eff = (t_small / t_big) / (n_big / n_small)
    result = {
        "sf_dir": sf_dir,
        "cores_small": n_small,
        "cores_big": n_big,
        "images_rows": small["images_rows"],
        "suite_sec_small": t_small,
        "suite_sec_big": t_big,
        "images_per_sec_small": small["images_per_sec"],
        "images_per_sec_big": big["images_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "met": eff >= 0.8,
        "queries_small": small["queries"],
        "queries_big": big["queries"],
    }
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
