"""The chained crawl-to-corpus flow: extraction output feeds the
curation family unchanged, deterministically."""

from win64_local_ocr_tool_spark.pipeline import (
    extracted_to_documents,
    run_crawl_to_corpus,
)


def test_chain_end_to_end_and_deterministic(spark, tmp_path):
    from win64_local_ocr_tool_spark.corpus import corpus_df

    docs = corpus_df(spark, 400)
    stats = run_crawl_to_corpus(
        spark, docs, str(tmp_path / "run1"), n_buckets=8
    )
    assert stats["extract_n_docs"] == 400
    # corrupt pages became error rows and never reach curation
    n_docs_stage = spark.read.parquet(
        str(tmp_path / "run1/docs/documents.parquet")
    ).count()
    assert n_docs_stage == 400 - stats["extract_n_errors"]
    # the curated corpus is a non-trivial, strict subset (quality gate
    # + dedup + decontamination all bite on the synthetic mix)
    assert 0 < stats["n_corpus_docs"] < n_docs_stage
    # doc_id is a pure function of the url -> rerun over a different
    # partitioning yields the identical corpus
    stats2 = run_crawl_to_corpus(
        spark, corpus_df(spark, 400).repartition(13),
        str(tmp_path / "run2"), n_buckets=8,
    )
    a = sorted(map(tuple, spark.read.parquet(stats["corpus_dir"]).collect()))
    b = sorted(map(tuple, spark.read.parquet(stats2["corpus_dir"]).collect()))
    assert a == b
    assert len(a) == stats["n_corpus_docs"]


def test_extracted_to_documents_shape(spark):
    from win64_local_ocr_tool_spark.corpus import corpus_df
    from win64_local_ocr_tool_spark.operators.extract import extract_all

    out = extracted_to_documents(extract_all(corpus_df(spark, 120)))
    rows = out.collect()
    assert out.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert all(r["doc_id"] >= 0 for r in rows)
    assert all(r["source"].startswith("site") for r in rows)
    assert all(r["n_chars"] == len(r["text"]) for r in rows)


def test_curate_benchmark_gate_is_explicit(spark, tmp_path):
    """With no benchmark table the chain must NOT sacrifice the
    doc_id % 29 slice (the registry oracle's synthetic convention);
    decontaminating against the corpus's own docs table must drop
    essentially every long doc (every 13-gram self-overlaps)."""
    from win64_local_ocr_tool_spark.corpus import corpus_df
    from win64_local_ocr_tool_spark.operators.textops import curate_documents
    from win64_local_ocr_tool_spark.pipeline import run_crawl_to_corpus

    stats = run_crawl_to_corpus(
        spark, corpus_df(spark, 300), str(tmp_path / "run"), n_buckets=8
    )
    plain = curate_documents(spark, stats["docs_dir"]).collect()
    assert len(plain) == stats["n_corpus_docs"]
    # no-benchmark curation keeps doc_id % 29 == 0 rows (the old chain
    # silently dropped them)
    assert any(r["doc_id"] % 29 == 0 for r in plain)
    selfdecon = curate_documents(
        spark, stats["docs_dir"], benchmark_dir=stats["docs_dir"]
    ).count()
    assert selfdecon == 0  # every kept doc >= 20 words self-overlaps


def test_null_html_rows_survive_as_rows(spark):
    """A crawl row whose body was lost (html NULL) must still appear in
    the output — empty extraction, never a dropped url or task
    failure."""
    import pandas as pd

    from win64_local_ocr_tool_spark.operators.extract import extract_all

    pdf = pd.DataFrame(
        {
            "url": ["https://a.example/1", "https://b.example/2"],
            "html": [None, ("<html><body><p>" + "hello world and a long enough paragraph of content " * 4 + "</p></body></html>").encode()],
        }
    )
    docs = spark.createDataFrame(pdf, schema="url string, html binary")
    out = {r["url"]: r for r in extract_all(docs, mega_bytes=65536).collect()}
    assert set(out) == {"https://a.example/1", "https://b.example/2"}
    assert out["https://a.example/1"]["extracted_text"] == ""
    assert "hello world and a long" in out["https://b.example/2"]["extracted_text"]
