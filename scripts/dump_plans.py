#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the load-bearing
queries, with the scale property each plan is evidence for. Run after
any plan-affecting change; tests/test_plans.py gates the same shapes."""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.01"


def fmt(df, max_lines=40) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    s = buf.getvalue()
    lines = s.splitlines()
    out = []
    for l in lines:
        if len(out) >= max_lines:
            out.append("   ... (truncated)")
            break
        out.append(l.rstrip())
    return "\n".join(out)


def main() -> None:
    import __spark_entry__ as entry  # noqa: F401 — registers the registry
    from win64_local_ocr_tool_spark.corpus import corpus_df
    from win64_local_ocr_tool_spark.operators.extract import extract_all, extract_normal
    from win64_local_ocr_tool_spark.operators.registry import QUERIES as q
    from win64_local_ocr_tool_spark.session import get_spark
    from win64_local_ocr_tool_spark.sources import with_ingest_metadata

    spark = get_spark("plans", master="local[4]")
    docs = corpus_df(spark, 100)
    import tempfile

    nb_dir = tempfile.mkdtemp(prefix="plans_nbytes_") + "/docs"
    with_ingest_metadata(docs).write.parquet(nb_dir)
    docs_nb = spark.read.parquet(nb_dir)

    sections = [
        (
            "Flagship extraction (hot path)",
            "Zero wide dependencies: Range -> mapInPandas(corpus gen) -> "
            "Project -> mapInPandas(extract). On a real table the Range+gen "
            "pair is a parquet/Iceberg scan. Nothing here serializes with "
            "executor count — the N->4N scaling property is structural.",
            extract_normal(docs),
        ),
        (
            "Extraction with distributed skew path enabled",
            "Union of the narrow normal branch and the mega branch; only "
            "mega rows (length >= threshold) reach the chunk shuffle. The "
            "Exchange nodes sit strictly under the mega side.",
            extract_all(docs, mega_bytes=65536),
        ),
        (
            "Dual-path extraction over a stored table with n_bytes metadata",
            "Both branch predicates push into the parquet scan as "
            "PushedFilters on the recorded n_bytes long column — the mega "
            "side's second scan prunes by row-group statistics instead of "
            "re-reading every payload.",
            extract_all(docs_nb, mega_bytes=65536),
        ),
        (
            "f1_threshold_filter — pushdown + pruning",
            "PushedFilters carries both predicates into the parquet scan; "
            "ReadSchema shows only the 4 referenced columns of 6.",
            q["f1_threshold_filter"](spark, SF),
        ),
        (
            "j3_composite_equi_join — broadcast dims",
            "All dimension joins are BroadcastHashJoin: the fact table is "
            "scanned once and never re-shuffled.",
            q["j3_composite_equi_join"](spark, SF),
        ),
        (
            "j1_range_join — bounded theta join",
            "BroadcastNestedLoopJoin against a 10-row bucket dim — correct "
            "for a bounded dim side; never run corpus-wide (SURVEY §4).",
            q["j1_range_join"](spark, SF),
        ),
        (
            "o8_global_topk — TakeOrderedAndProject",
            "Global top-k without a total sort.",
            q["o8_global_topk"](spark, SF),
        ),
        (
            "dedup_lsh_pairs — banding equi-join",
            "Candidate pairs come from an equi-join on (band, band-hash) — "
            "the LSH shape that avoids the quadratic all-pairs compare.",
            q["dedup_lsh_pairs"](spark, SF),
        ),
        (
            "decontaminate_ngram — broadcast the benchmark grams",
            "Eval suites are tiny next to a training corpus: the bench "
            "gram set broadcasts; the corpus side streams through with "
            "no shuffle on the gram key.",
            q["decontaminate_ngram"](spark, SF),
        ),
        (
            "training_corpus_final — kill-lists broadcast into one scan",
            "The composed payoff query: dup and contamination kill-lists "
            "broadcast into anti-joins against the single quality-gate "
            "scan of documents.",
            q["training_corpus_final"](spark, SF),
        ),
        (
            "f8_outlier_mask — broadcast the majority table",
            "The per-group majority (one row per user) broadcasts back "
            "onto the fact side: one shuffle for the count, zero for the "
            "mask join.",
            q["f8_outlier_mask"](spark, SF),
        ),
        (
            "sim_srp_lsh — LSH-bucketed similarity",
            "SRP signatures in one narrow pass (literal hyperplanes), "
            "band table localCheckpoint-ed, candidates from a "
            "(band, bandkey) equi-join — never an all-pairs compare.",
            q["sim_srp_lsh"](spark, SF),
        ),
        (
            "boilerplate_scrub_chunks — kill-list broadcast + kept-only regroup",
            "The heavy-unit census broadcasts into a LeftAnti "
            "BroadcastHashJoin; only surviving units pay the regroup "
            "shuffle that rebuilds documents.",
            q["boilerplate_scrub_chunks"](spark, SF),
        ),
        (
            "o6_mst_kruskal — document-local graph kernel",
            "One Exchange (the grouping key), then FlatMapGroupsInPandas: "
            "graphs never span groups, so the MST needs no iterative "
            "joins and no GraphFrames at any scale.",
            q["o6_mst_kruskal"](spark, SF),
        ),
    ]

    parts = [
        "# PLANS — physical-plan evidence for the scale claims\n",
        "Generated by `scripts/dump_plans.py`; the same shapes are gated by\n"
        "`tests/test_plans.py`. Excerpts are `explain('formatted')` output.\n",
    ]
    for title, why, df in sections:
        parts.append(f"\n## {title}\n\n{why}\n\n```\n{fmt(df)}\n```\n")

    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("".join(parts))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
