"""Determinism under parallelism: identical output at different input
partitionings (SURVEY.md §5 item 3 — the property that makes the
two-cluster-size scaling evidence meaningful)."""

import pandas as pd

from win64_local_ocr_tool_spark.corpus import corpus_df
from win64_local_ocr_tool_spark.operators.extract import extract_all

N = 700


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.sort_values("url").reset_index(drop=True)
    return [
        (
            r["url"],
            r["status"],
            r["extracted_text"],
            tuple(
                (int(s["span_id"]), int(s["char_start"]), int(s["char_end"]))
                for s in r["spans"]
            ),
            r["lang"],
        )
        for _, r in pdf.iterrows()
    ]


def test_output_invariant_under_partitioning(spark):
    a = extract_all(corpus_df(spark, N, partitions=2)).toPandas()
    b = extract_all(corpus_df(spark, N, partitions=31)).toPandas()
    assert _canon(a) == _canon(b)


def test_corpus_generation_invariant_under_partitioning(spark):
    a = corpus_df(spark, 300, partitions=3).toPandas().sort_values("url")
    b = corpus_df(spark, 300, partitions=17).toPandas().sort_values("url")
    assert (a["html"].apply(bytes).values == b["html"].apply(bytes).values).all()
    assert (a["text"].values == b["text"].values).all()
