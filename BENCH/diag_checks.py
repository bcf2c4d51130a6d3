"""Per-check scaling diagnostic: time each check ALONE (own Spark
session per core count, warm-up first) at two core counts, plus the
aggregation tail (verdict rollup + stats). Prints a table; used to
attribute the 8->32 efficiency loss to specific checks.

Usage: python BENCH/diag_checks.py [rows] [cores ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import os, sys, time, json
sys.path.insert(0, {repo!r})
cores = int(sys.argv[1]); rows = int(sys.argv[2])
from perl_data_validate_sanctions_spark.session import get_spark
from perl_data_validate_sanctions_spark.sources.synth import PLACES, synth_entries
sys.path.insert(0, {repo!r})
from bench import build_images, run_suite

spark = get_spark(app_name="diag", cores=cores)
cache = os.environ.get("PDVS_BENCH_CACHE", {repo!r} + "/.bench_cache")
images = build_images(spark, rows, cache)
entries = synth_entries(spark, n_extra=200)
ref_keys = spark.createDataFrame([(p,) for p in PLACES], "key string")
warm = build_images(spark, 20000, cache).repartition(max(cores, 4))
run_suite(spark, warm, entries, ref_keys, pixel_sample=4096)

out = {{}}
CHECKS = ("schema", "unique_image_id", "unique_phash", "referential",
          "drift_w", "drift_h", "drift_fmt", "integrity", "sanctioned")
for c in CHECKS:
    t = run_suite(spark, images, entries, ref_keys, checks=(c,),
                  pixel_sample=4096)[0]
    t2 = run_suite(spark, images, entries, ref_keys, checks=(c,),
                   pixel_sample=4096)[0]
    out[c] = round(min(t, t2), 2)
# full suite for reference (concurrent on)
out["FULL"] = round(run_suite(spark, images, entries, ref_keys,
                              pixel_sample=4096)[0], 2)
out["FULL2"] = round(run_suite(spark, images, entries, ref_keys,
                               pixel_sample=4096)[0], 2)
print("DIAG " + json.dumps(out))
"""


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    core_list = [int(c) for c in sys.argv[2:]] or [32, 8]
    results = {}
    for cores in core_list:
        code = CHILD.format(repo=REPO)
        p = subprocess.run(
            [sys.executable, "-c", code, str(cores), str(rows)],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("DIAG ")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-3000:])
            raise SystemExit(1)
        results[cores] = json.loads(line[-1][5:])
        print(f"cores={cores}: {results[cores]}")
    if len(core_list) == 2:
        a, b = core_list  # a = big, b = small
        print(f"\n{'check':18s} {b:>4d}c {a:>5d}c  speedup  eff({b}->{a})")
        for k in results[a]:
            ta, tb = results[a][k], results[b][k]
            sp = tb / ta if ta else float("inf")
            print(f"{k:18s} {tb:5.1f} {ta:5.1f}  {sp:6.2f}x  "
                  f"{sp / (a / b):.3f}")


if __name__ == "__main__":
    main()
