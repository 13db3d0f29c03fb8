"""Golden end-to-end: Spark pipeline output must be byte-identical to the
single-process reference extractor, per url — the primary gate
(SURVEY.md §5 item 1, north rule)."""

import pandas as pd
import pytest

from win64_local_ocr_tool_spark.corpus import corpus_df
from win64_local_ocr_tool_spark.golden import golden_pandas
from win64_local_ocr_tool_spark.operators.extract import extract_all
from win64_local_ocr_tool_spark.pipeline import run_extraction

N = 1100  # covers PDF rows (211k), corrupt rows (499k), one mega row (997)


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("url").reset_index(drop=True)
    pdf["spans"] = pdf["spans"].apply(
        lambda ss: [
            (int(s["span_id"]), int(s["char_start"]), int(s["char_end"]))
            for s in ss
        ]
    )
    return pdf[["url", "status", "extracted_text", "spans", "lang"]]


@pytest.fixture(scope="module")
def golden():
    return _normalize(golden_pandas(N))


def _assert_matches_golden(got_pdf, golden):
    got = _normalize(got_pdf)
    assert len(got) == len(golden)
    for col in ["url", "status", "extracted_text", "lang", "spans"]:
        mism = (got[col] != golden[col]).sum()
        assert mism == 0, f"{mism} mismatches in {col}"


def test_pipeline_matches_golden(spark, golden):
    res = run_extraction(spark, corpus_df(spark, N))
    _assert_matches_golden(res["extracted"].toPandas(), golden)


def test_pipeline_matches_golden_when_everything_is_mega(spark, golden):
    """Force (nearly) every document through the chunked skew path with a
    tiny chunk size — output must still be byte-identical. This is the
    strongest equivalence test of the split/reassemble machinery."""
    docs = corpus_df(spark, N)
    got = extract_all(docs, mega_bytes=600, chunk_blocks=5)
    _assert_matches_golden(got.toPandas(), golden)


def test_error_rows_are_isolated(spark, golden):
    """Corrupt payloads yield status='error' rows, never task failures."""
    errs = golden[golden["status"] == "error"]
    assert len(errs) == 2  # rows 499, 998
    assert (errs["extracted_text"] == "").all()
    assert (errs["lang"] == "und").all()
