"""Kill/resume: a job SIGKILLed mid-run resumes at partition granularity
— completed commit groups are never recomputed, the converged output is
byte-identical to golden (the north rule's checkpoint requirement,
exercised with a REAL kill -9, not a simulation)."""

import json
import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 3000
BUCKETS = 16
GROUPS = 8


def _run_job(out, lin, resume: bool, kill_after_groups: int | None):
    cmd = [
        sys.executable, "-m", "win64_local_ocr_tool_spark.jobs", "extract",
        "--synthetic", str(N), "--output", out, "--lineage", lin,
        "--n-buckets", str(BUCKETS), "--commit-batches", str(GROUPS),
        "--master", "local[4]",
    ] + (["--resume"] if resume else [])
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.Popen(
        cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True,
    )
    if kill_after_groups is None:
        out_text, _ = proc.communicate(timeout=600)
        assert proc.returncode == 0, out_text
        return json.loads(out_text.strip().splitlines()[-1]), False

    # poll the lineage table until >= kill_after_groups commit groups
    # have landed, then SIGKILL the job mid-flight
    deadline = time.monotonic() + 540
    import duckdb

    while time.monotonic() < deadline:
        if proc.poll() is not None:  # finished before we could kill it
            out_text, _ = proc.communicate()
            return json.loads(out_text.strip().splitlines()[-1]), False
        try:
            n_done = duckdb.sql(
                f"SELECT count(DISTINCT partition_key) "
                f"FROM read_parquet('{lin}/*.parquet')"
            ).fetchone()[0]
        except Exception:
            n_done = 0
        if n_done >= kill_after_groups * (BUCKETS // GROUPS):
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait(timeout=60)
            return {"killed_with_done": int(n_done)}, True
        time.sleep(0.3)
    proc.kill()
    pytest.fail("job neither progressed nor finished within deadline")


def test_sigkill_then_resume_converges(spark, tmp_path):
    out = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")

    stats1, killed = _run_job(out, lin, resume=False, kill_after_groups=2)

    stats2, _ = _run_job(out, lin, resume=True, kill_after_groups=None)
    if killed:
        # the completed groups were not recomputed
        assert stats2["pruned_partitions"] >= 2 * (BUCKETS // GROUPS)
        assert stats2["pruned_partitions"] + stats2["n_partitions"] == BUCKETS
    # converged output: every url exactly once, byte-identical to golden
    from win64_local_ocr_tool_spark.golden import golden_pandas

    got = (
        spark.read.parquet(out)
        .select("url", "status", "extracted_text", "lang")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        golden_pandas(N)[["url", "status", "extracted_text", "lang"]]
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == N
    pd.testing.assert_frame_equal(got, want)

    # lineage: every bucket done exactly once across both runs
    lineage = spark.read.parquet(lin).toPandas()
    done = lineage[lineage["status"] == "done"]["partition_key"]
    assert sorted(done.tolist()) == list(range(BUCKETS))
    assert done.is_unique
