"""Partition-granular resume: a killed job's second invocation recomputes
only missing partitions and converges to the same bytes (north rule;
analog of the reference's idempotent per-page rewrite,
``segment_from_point_clusters.py:372-373``)."""

import pandas as pd
from pyspark.sql import functions as F

from win64_local_ocr_tool_spark.corpus import corpus_df
from win64_local_ocr_tool_spark.golden import golden_pandas
from win64_local_ocr_tool_spark.lineage import with_partition_key
from win64_local_ocr_tool_spark.pipeline import run_extraction

N = 600
N_BUCKETS = 16


def test_resume_completes_without_recompute(spark, tmp_path):
    out = str(tmp_path / "extracted")
    lin = str(tmp_path / "lineage")
    docs = corpus_df(spark, N)

    # --- simulated interrupted run: process only half the keyspace by
    # feeding half the input, then truncate the lineage to those keys
    # (an interrupted job has no lineage for unprocessed partitions;
    # empty-but-seen partitions legitimately log done rows, so input
    # filtering alone no longer models interruption) ---
    partial = with_partition_key(docs, N_BUCKETS).filter(
        F.col("partition_key") < 8
    ).drop("partition_key")
    s1 = run_extraction(
        spark, partial, out_dir=out, lineage_dir=lin, n_buckets=N_BUCKETS
    )
    # every bucket of the partial run's input space is logged — the
    # 8 fed buckets with rows, the 8 empty ones with n_rows=0
    assert s1["n_partitions"] == N_BUCKETS
    n_first = s1["n_docs"]
    assert 0 < n_first < N
    trunc = spark.read.parquet(lin).filter(F.col("partition_key") < 8)
    trunc_pdf = trunc.toPandas()
    import shutil

    shutil.rmtree(lin)
    spark.createDataFrame(trunc_pdf, schema=trunc.schema).write.parquet(lin)

    # --- resumed full run ---
    s2 = run_extraction(
        spark, docs, out_dir=out, lineage_dir=lin, n_buckets=N_BUCKETS,
        resume=True,
    )
    # only the missing half was processed
    assert s2["pruned_partitions"] == 8
    assert s2["n_partitions"] == 8
    assert n_first + s2["n_docs"] == N

    # lineage: every bucket done exactly once (no recompute)
    lineage = spark.read.parquet(lin).toPandas()
    done = lineage[lineage["status"] == "done"]
    assert sorted(done["partition_key"].tolist()) == list(range(N_BUCKETS))
    assert done["partition_key"].is_unique

    # converged output == golden, byte-identical
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
    pd.testing.assert_frame_equal(got, want)


def test_rerun_of_done_partition_is_idempotent(spark, tmp_path):
    """Re-running WITHOUT resume overwrites partitions in place
    (dynamic partition overwrite) and yields the same bytes."""
    out = str(tmp_path / "extracted")
    docs = corpus_df(spark, 200)
    run_extraction(spark, docs, out_dir=out, n_buckets=8)
    first = spark.read.parquet(out).toPandas().sort_values("url")
    run_extraction(spark, docs, out_dir=out, n_buckets=8)
    second = spark.read.parquet(out).toPandas().sort_values("url")
    assert (first["extracted_text"].values == second["extracted_text"].values).all()
    assert len(first) == len(second) == 200


def test_straggler_report_finds_planted_fat_partition(spark, tmp_path):
    """lineage.straggler_report over a REAL lineage dir (written via
    append_lineage, multiple runs): the planted fat partition must rank
    first in its stage with the right integer skew ratio, and a resume
    run's stale duplicate done-row for the same key must be superseded
    by the latest row."""
    import time

    from win64_local_ocr_tool_spark.lineage import (
        append_lineage,
        read_lineage,
        straggler_report,
    )

    lin_dir = str(tmp_path / "lineage")
    # run 1: 15 uniform partitions (100 rows) + one fat one (5000 rows)
    rows = [(k, 100, 0) for k in range(15)] + [(15, 5000, 2)]
    counts = spark.createDataFrame(
        rows, schema="partition_key int, n_rows long, n_errors long"
    )
    append_lineage(spark, lin_dir, "extract", counts, wall_ms=1234)
    # run 2 (resume): re-logs key 3 with a DIFFERENT count — the report
    # must use this latest row, not double-count
    time.sleep(0.01)
    again = spark.createDataFrame(
        [(3, 120, 0)], schema="partition_key int, n_rows long, n_errors long"
    )
    append_lineage(spark, lin_dir, "extract", again, wall_ms=99)
    # an unrelated stage with its own (non-straggling) profile
    other = spark.createDataFrame(
        [(k, 50, 0) for k in range(4)],
        schema="partition_key int, n_rows long, n_errors long",
    )
    append_lineage(spark, lin_dir, "curate_exact", other, wall_ms=5)

    rep = straggler_report(read_lineage(spark, lin_dir), top_k=3).collect()
    by_stage = {}
    for r in rep:
        by_stage.setdefault(r["stage"], []).append(r)
    ext = sorted(by_stage["extract"], key=lambda r: r["rnk"])
    assert len(ext) == 3
    assert ext[0]["partition_key"] == 15 and ext[0]["n_rows"] == 5000
    assert ext[0]["rnk"] == 1
    assert ext[0]["p50_rows"] == 100  # median of the uniform bulk
    assert ext[0]["skew_x1000"] == 50000  # 5000*1000 div 100
    assert ext[1]["partition_key"] == 3 and ext[1]["n_rows"] == 120
    assert all(r["n_rows"] == 50 for r in by_stage["curate_exact"])


def test_straggler_report_deterministic_under_ts_ties(spark, tmp_path):
    """ADVICE r4: duplicate done-rows for one (stage, partition_key)
    written in a single append batch share one current_timestamp; the
    latest-row pick must still be deterministic (n_rows/wall_ms desc
    tiebreak), not dependent on parquet row order."""
    from win64_local_ocr_tool_spark.lineage import (
        append_lineage,
        read_lineage,
        straggler_report,
    )

    lin_dir = str(tmp_path / "lin")
    counts = spark.createDataFrame(
        [(3, 10, 0), (3, 999, 0), (1, 5, 0), (2, 7, 0)],
        "partition_key int, n_rows long, n_errors long",
    )
    append_lineage(spark, lin_dir, "extract", counts, wall_ms=50)
    for _ in range(3):
        rep = {
            r["partition_key"]: r
            for r in straggler_report(read_lineage(spark, lin_dir)).collect()
        }
        assert rep[3]["n_rows"] == 999 and rep[3]["rnk"] == 1


def test_straggler_resume_splits_planted_fat_partition(spark, tmp_path):
    """r4 verdict item 3 — the straggler report becomes actionable: a
    resume over a corpus where a few url-ranges hold ~100x the median
    partition bytes must (a) flag exactly the giant-doc partitions, (b)
    route them through the distributed chunk path at the finer byte
    threshold (the giant payloads exceed it, so they fan out as chunks
    instead of one fat task), and (c) stay byte-identical to the plain
    single-path run — the split is a physical re-plan only."""
    import random

    from pyspark.sql import functions as F

    from win64_local_ocr_tool_spark.corpus import _html_page
    from win64_local_ocr_tool_spark.lineage import with_partition_key
    from win64_local_ocr_tool_spark.pipeline import run_extraction

    rng = random.Random("fat:1")
    rows = []
    for i in range(320):
        html, _ = _html_page(random.Random(f"s:{i}"), "en", n_paras=3)
        rows.append((f"https://small.example/{i:04d}", html))
    giants = []
    for i in range(2):
        html, _ = _html_page(random.Random(f"g:{i}"), "en", n_paras=7000)
        assert len(html) > 1 << 20
        giants.append(f"https://giant.example/{i}")
        rows.append((giants[-1], html))
    docs = spark.createDataFrame(rows, "url string, html binary").withColumn(
        "n_bytes", F.length("html")
    )

    base = run_extraction(
        spark, docs,
        out_dir=str(tmp_path / "a"), lineage_dir=str(tmp_path / "la"),
        n_buckets=16,
    )
    assert base["straggler_split_partitions"] == []  # not a resume

    stats = run_extraction(
        spark, docs,
        out_dir=str(tmp_path / "b"), lineage_dir=str(tmp_path / "lb"),
        n_buckets=16, resume=True,
    )
    giant_keys = {
        r["partition_key"]
        for r in with_partition_key(
            docs.filter(F.col("url").isin(giants)), 16
        ).select("partition_key").collect()
    }
    assert set(stats["straggler_split_partitions"]) == giant_keys
    # the finer threshold actually catches the giant payloads -> they
    # take the chunk path (fan-out), bounding any one task's input
    assert stats["straggler_mega_bytes"] == (8 << 20) // 8
    assert all(len(r[1]) >= stats["straggler_mega_bytes"] for r in rows[-2:])

    a = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "a")).collect())
    )
    b = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "b")).collect())
    )
    assert a == b  # byte-identity across the physical re-plan


def test_straggler_keys_from_lineage_report(spark, tmp_path):
    """The lineage-signal source of _straggler_keys: a prior epoch's
    extract rows flag a partition at >= the skew ratio; with no
    n_bytes column the input-size source is skipped and the lineage
    report alone drives the flag."""
    from win64_local_ocr_tool_spark.lineage import append_lineage
    from win64_local_ocr_tool_spark.pipeline import (
        STRAGGLER_X1000,
        _straggler_keys,
    )

    lin_dir = str(tmp_path / "lin")
    counts = spark.createDataFrame(
        [(k, 5000 if k == 3 else 50, 0) for k in range(8)],
        "partition_key int, n_rows long, n_errors long",
    )
    append_lineage(spark, lin_dir, "extract", counts, wall_ms=10)
    assert STRAGGLER_X1000 == 10_000  # 5000 vs p50=50 -> 100x -> flagged
    docs = spark.createDataFrame(
        [("https://x.example/1", b"<p>x</p>")], "url string, html binary"
    )
    assert _straggler_keys(spark, docs, lin_dir) == {3}
    assert _straggler_keys(spark, docs, None) == set()
