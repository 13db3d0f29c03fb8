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
