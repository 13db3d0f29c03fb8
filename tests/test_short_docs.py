"""Sub-shingle and sub-k-gram documents: Spark and DuckDB must agree
(Spark's sequence(0,-1) is [0,-1], not empty — regression for the
crash/parity bug on texts shorter than the gram width)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__  # noqa: F401 — populates the registry

from win64_local_ocr_tool_spark.operators.registry import ORACLES as REG_SQL, QUERIES as REG

DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "hello world",          # 2 words: no 3-gram shingles
            "hi",                   # < 8 chars: no winnow k-grams
            "a b c d e f g h i",    # normal
            "",                     # empty
            "one two three four",   # exactly enough
        ],
    }
)


@pytest.fixture(scope="module")
def tiny_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_sf")
    DOCS.to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["dedup_minhash_sig", "dedup_lsh_pairs", "dedup_ngram_jaccard",
     "doc_fingerprint_winnow", "dedup_simhash"],
)
def test_short_docs_match_oracle(spark, tiny_sf_dir, name):
    df = REG[name](spark, tiny_sf_dir)
    got = (
        df.toPandas().sort_values(by=list(df.columns)).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tiny_sf_dir}/documents.parquet')"
    )
    want = (
        con.execute(REG_SQL[name])
        .df()
        .sort_values(by=list(got.columns))
        .reset_index(drop=True)
    )
    assert len(got) == len(want), (name, len(got), len(want))
    for c in got.columns:
        assert list(got[c].astype(str)) == list(want[c].astype(str)), (
            name, c,
        )
