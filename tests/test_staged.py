"""Staged (checkpointed) pipeline: blocks stage table, per-stage
lineage/resume, byte-equality with the single-pass pipeline."""

import pandas as pd
from pyspark.sql import functions as F

from win64_local_ocr_tool_spark.corpus import corpus_df
from win64_local_ocr_tool_spark.golden import golden_pandas
from win64_local_ocr_tool_spark.staged import (
    BLOCKS_SCHEMA,
    run_staged_extraction,
    tokenize_to_blocks,
)

N = 600


def test_blocks_table_shape(spark):
    docs = corpus_df(spark, 250)
    blocks = tokenize_to_blocks(docs)
    pdf = blocks.filter(F.col("block_id") >= 0).limit(50).toPandas()
    assert set(pdf.columns) == {
        "url", "kind", "block_id", "tag", "depth", "pos",
        "text", "text_len", "link_text_len",
    }
    # one sentinel per document, even for corrupt payloads
    sent = blocks.filter(F.col("block_id") == -1)
    assert sent.count() == 250
    assert sent.select("url").distinct().count() == 250


def test_staged_matches_golden_and_resumes(spark, tmp_path):
    docs = corpus_df(spark, N)
    work = str(tmp_path / "work")

    stats = run_staged_extraction(spark, docs, work, n_buckets=8)
    assert stats["n_docs"] == N

    got = (
        spark.read.parquet(stats["out_dir"])
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

    # resume: everything done -> both stages fully pruned, no rewrites
    stats2 = run_staged_extraction(spark, docs, work, n_buckets=8, resume=True)
    assert stats2["tokenize_pruned"] == 8
    assert stats2["assemble_pruned"] == 8
    assert stats2["assemble_partitions_new"] == 0
    assert stats2["n_docs"] == N

    lineage = spark.read.parquet(stats["lineage_dir"]).toPandas()
    for stage in ("tokenize", "assemble"):
        keys = lineage[lineage["stage"] == stage]["partition_key"]
        assert sorted(keys.tolist()) == list(range(8)), stage
        assert keys.is_unique, stage
