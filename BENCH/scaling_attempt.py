"""Gated idle-window retry for the 8→32 scaling pair (VERDICT r3 #1).

The only north-rule line still reading false is ``met_8_to_32_raw``.
Round 3 established that the number is machine-state-bound: the same
VM's Spark-free render kernel, fanned out as independent processes,
itself scales at only ~0.46-0.67 over that span depending on the
credit/frequency state of the hour.  So re-attempts are only worth
their compute when a cheap pre-probe says the machine can currently
express ≥0.8 — otherwise the attempt measures the VM, not the engine.

This script automates that policy:

1. Probe: 1-proc render kernel Mpx/s (readiness) and the 8→32
   kernel ceiling (32-proc aggregate / 8-proc aggregate / 4).
2. Append EVERY probe to ``BENCH/scaling_attempts.jsonl`` — the
   verdict's close-out condition is either a passing raw number or
   ≥3 recorded gated attempts across sessions all showing
   ceiling < 0.8, so negative probes are evidence too.
3. Launch the full timed pair (``bench_scaling.py`` span 8_to_32,
   which rewrites BENCH/scaling.json) only when BOTH gates pass:
   1-proc ≥ PDVS_GATE_1PROC (default 700 Mpx/s) and ceiling ≥
   PDVS_GATE_CEILING (default 0.70).
4. Poll: with ``--poll N --max-wait S`` the probe repeats every N
   seconds until the gates pass or the wait budget is spent.

Usage:  python BENCH/scaling_attempt.py [--poll 300] [--max-wait 1800]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from BENCH.bench_scaling import kernel_mpx  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "BENCH", "scaling_attempts.jsonl")


def probe() -> dict:
    k1 = kernel_mpx(1)
    k8 = kernel_mpx(8)
    k32 = kernel_mpx(32)
    return {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "kernel_mpxs_1proc": round(k1, 1),
        "kernel_mpxs_8proc": round(k8, 1),
        "kernel_mpxs_32proc": round(k32, 1),
        "ceiling_8_to_32": round((k32 / k8) / 4.0, 3),
    }


def log_attempt(rec: dict) -> None:
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--poll", type=int, default=0,
                    help="re-probe every N seconds until gates pass")
    ap.add_argument("--max-wait", type=int, default=1800)
    args = ap.parse_args()
    gate_1proc = float(os.environ.get("PDVS_GATE_1PROC", "700"))
    gate_ceiling = float(os.environ.get("PDVS_GATE_CEILING", "0.70"))
    deadline = time.time() + args.max_wait
    while True:
        p = probe()
        ready = (p["kernel_mpxs_1proc"] >= gate_1proc
                 and p["ceiling_8_to_32"] >= gate_ceiling)
        p["gates"] = {"min_1proc": gate_1proc, "min_ceiling": gate_ceiling}
        p["launched"] = bool(ready)
        print(json.dumps(p), flush=True)
        if ready:
            log_attempt(p)
            env = dict(os.environ, PDVS_SCALE_SPANS="8_to_32")
            rc = subprocess.call(
                [sys.executable, os.path.join(REPO, "BENCH",
                                              "bench_scaling.py")],
                env=env, cwd=REPO)
            with open(os.path.join(REPO, "BENCH", "scaling.json")) as f:
                sj = json.load(f)
            log_attempt({
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "ran_pair": True, "rc": rc,
                "raw_efficiency_8_to_32": sj.get("raw_efficiency_8_to_32"),
                "machine_ceiling_8_to_32": sj.get("machine_ceiling_8_to_32"),
                "met_8_to_32_raw": sj.get("met_8_to_32_raw"),
            })
            return rc
        if not args.poll or time.time() + args.poll > deadline:
            # Bounded wait spent without a launch-worthy window: record
            # the final (best-effort) probe as a gated negative attempt.
            log_attempt(p)
            print("gates not met within wait budget; probe logged",
                  flush=True)
            return 1
        time.sleep(args.poll)


if __name__ == "__main__":
    raise SystemExit(main())
