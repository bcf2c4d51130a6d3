"""The north rule's launch shape, exercised for real: zip the package,
launch scripts/submit_job.py through the actual spark-submit binary
with ``--py-files``, from a NEUTRAL working directory and with the repo
scrubbed from PYTHONPATH — so the package can only resolve from the
zip, on the driver and inside the Python workers the mapInPandas checks
spawn. Asserts the process output and the written report tables."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "perl_data_validate_sanctions_spark"


def _spark_submit_bin() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("no spark-submit binary available")


def _build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "pdvs.zip")
    src = os.path.join(REPO, PKG)
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(src):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(tmp_path, master: str, subdir: str) -> dict:
    zpath = _build_zip(str(tmp_path))
    job = str(tmp_path / "submit_job.py")
    if not os.path.exists(job):
        shutil.copy(os.path.join(REPO, "scripts", "submit_job.py"), job)
    sink = str(tmp_path / subdir)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            _spark_submit_bin(),
            "--master", master,
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            job,
            "--synth-rows", "2000",
            "--sink-dir", sink,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    out["_sink"] = sink
    return out


def test_spark_submit_py_files_end_to_end(tmp_path):
    out = _submit(tmp_path, "local[2]", "report")
    assert out["n_rows"] == 2000
    assert out["n_partitions"] == 32
    # the synthetic table plants violations for these checks; their
    # detection through the zip-shipped package is the real assertion
    # (uniqueness joins, referential anti-join, mapInPandas integrity)
    for check in ("unique_image_id", "unique_phash", "integrity",
                  "sanctioned"):
        assert out["summary"].get(check, 0) > 0, out["summary"]
    # and the production artifacts really landed as parquet tables
    for name in ("violations", "partition_verdicts", "check_summary"):
        assert os.path.isdir(os.path.join(out["_sink"],
                                          f"{name}.parquet")), name


def test_spark_submit_two_cluster_sizes_identical_results(tmp_path):
    """The north rule's launch shape at two parallelism levels: the
    SAME submit script on the SAME input at N and 4N local cores must
    produce identical verdicts — results are a function of the data,
    never of the cluster size. (Throughput at the two sizes is the
    scaling harness's job — BENCH/bench_scaling.py; this pins the
    correctness half.)"""
    small = _submit(tmp_path, "local[1]", "report_n")
    big = _submit(tmp_path, "local[4]", "report_4n")
    for k in ("n_rows", "n_partitions", "n_failed_partitions", "summary"):
        assert small[k] == big[k], (k, small[k], big[k])
