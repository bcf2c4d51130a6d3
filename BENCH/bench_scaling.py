"""Two-cluster-size scaling evidence (BASELINE.json north_rule): run the
identical full-suite job at two parallelism levels on the same input
(fresh JVM per leg) and report throughput at both + scaling efficiency.

This sandbox is ONE machine, so "N vs 4N executors" becomes N vs 4N
local cores sharing one memory bus and one frequency budget — which
caps the wall-clock efficiency ANY workload can express. To keep the
evidence honest the harness also measures that cap with the engine's
own hottest kernel (the counter-based pixel renderer, pure numpy, NO
Spark) fanned out as independent processes: whatever efficiency those
processes reach is the hardware ceiling for the span. On a real
cluster, 4N executors bring 4N memory buses and 4N frequency budgets,
so the ceiling is ~1.0 there; the engine-attributable scaling loss is
raw_efficiency / machine_ceiling, reported as
``normalized_efficiency``.

Outputs BENCH/scaling.json with, per span (1→4 and 8→32 cores):
raw suite efficiency, machine ceiling, normalized efficiency — each
with its OWN ``met_<span>_raw`` / ``met_<span>_normalized`` verdict
key. There is deliberately no generic ``met``: a single verdict key
whose underlying experiment can change between rounds invites
misreading (exactly what round 2's artifact did).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_KERNEL = """
import numpy as np, time, sys
sys.path.insert(0, {repo!r})
from perl_data_validate_sanctions_spark.sources import codec
seeds = np.arange(64, dtype=np.uint64)
wh = 640*480
codec.render_batch(seeds, wh, slot="a")
t0=time.time(); it=0
while time.time()-t0 < 5:
    codec.render_batch(seeds, wh, slot="a"); it+=1
print(it*64*wh/(time.time()-t0)/1e6)
"""


def kernel_mpx(n_procs: int) -> float:
    """Aggregate Mpx/s of the engine's render kernel over n_procs
    independent processes — the machine's wall-clock scaling ceiling
    carrier (no Spark, no Python-level sharing)."""
    code = _KERNEL.format(repo=REPO)
    procs = [
        subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, text=True)
        for _ in range(n_procs)
    ]
    return sum(
        float(p.communicate()[0].strip().splitlines()[-1]) for p in procs
    )


def wait_for_machine(min_mpx: float = 650.0, max_wait_s: int = 1500) -> float:
    """Block until the single-process kernel reaches its idle-machine
    baseline (~720 Mpx/s). This VM is credit-throttled: after sustained
    load the SAME kernel measures ~2× slower, which would put machine
    state, not the engine, into the efficiency number. Returns the
    last measured Mpx/s (recorded in the artifact either way)."""
    import time as _t

    deadline = _t.time() + max_wait_s
    mpx = kernel_mpx(1)
    while mpx < min_mpx and _t.time() < deadline:
        _t.sleep(90)
        mpx = kernel_mpx(1)
    return mpx


def run_at(cores: int, sf_dir: str, n_rows: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    # suite-only (the north metric). Row count per span is sized so the
    # fixed multi-stage latency floor (~15-25 s of driver/AQE/stage
    # scheduling, identical at both core counts) amortizes into the
    # measured work, same as sizing per-executor work on a real cluster.
    env["PDVS_BENCH_SUITE_ONLY"] = "1"
    env["PDVS_BENCH_ROWS"] = str(n_rows)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def span(n_small: int, n_rows: int, sf_dir: str, attempts: int = 2) -> dict:
    n_big = 4 * n_small
    ready_mpx = wait_for_machine()
    # Alternate big/small legs over `attempts` rounds and take the MIN
    # wall per leg: this VM's noise (credit throttle, khugepaged, page
    # cache) only ever ADDS time to a leg, so per-leg minima are the
    # drift-robust estimator; every attempt is recorded. The machine-
    # readiness gate runs before EVERY leg, not once per span — a leg
    # measured on post-load depleted credits records the machine, not
    # the engine (round 2's 8→32 legs ran back-to-back and the second
    # leg absorbed the first leg's depletion). Leg order alternates
    # between rounds so neither leg systematically inherits whatever
    # depletion survives the gate.
    bigs, smalls = [], []
    big = small = None
    for i in range(max(1, attempts)):
        order = (n_big, n_small) if i % 2 == 0 else (n_small, n_big)
        for cores in order:
            if i > 0 or cores != order[0]:
                wait_for_machine()
            res = run_at(cores, sf_dir, n_rows)
            (bigs if cores == n_big else smalls).append(res["value"])
            if cores == n_big:
                big = res
            else:
                small = res
    raw = (min(smalls) / min(bigs)) / (n_big / n_small)
    k_small = kernel_mpx(n_small)
    k_big = kernel_mpx(n_big)
    ceiling = (k_big / k_small) / (n_big / n_small)
    return {
        "cores_small": n_small,
        "cores_big": n_big,
        "images_rows": n_rows,
        "suite_sec_small": min(smalls),
        "suite_sec_big": min(bigs),
        "attempts_small": smalls,
        "attempts_big": bigs,
        "images_per_sec_small": round(n_rows / min(smalls), 1),
        "images_per_sec_big": round(n_rows / min(bigs), 1),
        "raw_efficiency": round(raw, 3),
        "machine_ready_kernel_mpxs_1proc": round(ready_mpx, 1),
        "machine_ceiling_kernel_mpxs": {
            str(n_small): round(k_small, 1), str(n_big): round(k_big, 1)
        },
        "machine_ceiling_efficiency": round(ceiling, 3),
        "normalized_efficiency": round(min(raw / ceiling, 1.0), 3),
        "queries_small": small["queries"],
        "queries_big": big["queries"],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = os.path.join(REPO, "BENCH", "scaling.json")
    # PDVS_SCALE_SPANS selects which spans to (re)measure; others are
    # carried over from the existing artifact (each span is gated on
    # machine readiness, so partial refresh is sound)
    which = os.environ.get("PDVS_SCALE_SPANS", "8_to_32,1_to_4").split(",")
    spans = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            spans = json.load(f).get("spans", {})
    if "8_to_32" in which:
        # secondary span (the brief's local[8]/local[32] example): at
        # 8→32 active cores the machine itself caps wall-clock
        # efficiency (~0.79 for cache-resident ALU loops, ~0.63
        # DRAM-touching) — reported raw next to the measured ceiling +
        # normalized. Rows sized so a leg finishes BEFORE the burstable
        # credit pool depletes mid-leg (round 2 ran 9.6M-row legs whose
        # second half measured a throttled machine; the floor is ~3 s,
        # <7% of the 32-core leg at this size).
        spans["8_to_32"] = span(
            8, int(os.environ.get("PDVS_SCALE_ROWS_HIGH", "4800000")),
            sf_dir,
            attempts=int(os.environ.get("PDVS_SCALE_ATTEMPTS", "2")),
        )
    if "1_to_4" in which:
        # HEADLINE span: 1→4 cores. On this one-machine sandbox, few
        # active cores ≈ independent executors (measured machine
        # ceiling ~0.93-0.97 when fresh), so the raw wall-clock number
        # actually reflects the engine; rows sized 4× SF so the ~9 s
        # scale-free driver/AQE floor amortizes on both legs.
        spans["1_to_4"] = span(
            1, int(os.environ.get("PDVS_SCALE_ROWS", "2400000")), sf_dir,
            attempts=int(os.environ.get("PDVS_SCALE_ATTEMPTS", "2")),
        )
    # Per-span verdict keys ONLY — round 2 shipped a generic
    # `met`/`scaling_efficiency` pair whose underlying experiment
    # changed between rounds (8→32 in r1, 1→4 in r2), which let the
    # artifact read as "the original gate passed" against a different
    # measurement. Every key now names its span; there is no generic
    # `met`.
    result = {
        "sf_dir": sf_dir,
        "protocol": "identical suite at N vs 4N local cores, machine-"
                    "readiness-gated before every leg, per-leg minima "
                    "over alternating attempts; ceiling = engine render "
                    "kernel as independent processes (no Spark); "
                    "normalized = raw / ceiling (a real N→4N executor "
                    "fleet scales bandwidth+frequency with N, so its "
                    "ceiling ≈ 1)",
        "target": 0.8,
        "spans": spans,
        "note": "this sandbox is ONE burstable VM: N vs 4N cores share "
                "one memory bus, one frequency budget and one CPU-"
                "credit pool, so the wall-clock ceiling any workload "
                "can express falls with N (kernel-measured per span). "
                "1→4 stays under the sustainable budget (ceiling "
                "~0.9); 8→32 cannot reach 0.8 raw on this hardware "
                "even for the Spark-free kernel.",
    }
    for key, sp in spans.items():
        result[f"raw_efficiency_{key}"] = sp["raw_efficiency"]
        result[f"met_{key}_raw"] = sp["raw_efficiency"] >= 0.8
        result[f"machine_ceiling_{key}"] = sp["machine_ceiling_efficiency"]
        result[f"normalized_efficiency_{key}"] = sp["normalized_efficiency"]
        result[f"met_{key}_normalized"] = sp["normalized_efficiency"] >= 0.8
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
