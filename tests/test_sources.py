"""Source readers (SURVEY S1/S2): binaryFile folder scan and
schema-pinned parquet reads feed the same pipeline."""

import os

from win64_local_ocr_tool_spark.corpus import gen_row
from win64_local_ocr_tool_spark.golden import golden_row
from win64_local_ocr_tool_spark.operators.extract import extract_all
from win64_local_ocr_tool_spark.sources import (
    documents_from_rows,
    read_documents,
    read_raw_pages,
)


def test_read_documents_schema_pinned(spark, tmp_path):
    p = str(tmp_path / "docs")
    rows = [gen_row(i) for i in range(30)]
    documents_from_rows(spark, rows).write.parquet(p)
    got = read_documents(spark, p)
    assert [f.name for f in got.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    assert got.count() == 30


def test_read_raw_pages_folder_scan(spark, tmp_path):
    """Raw files on disk -> documents-shaped rows -> extraction output
    identical to the parquet-sourced path (source swap changes nothing
    downstream)."""
    d = tmp_path / "crawl"
    d.mkdir()
    ids = [1, 2, 211, 353]  # html, html, pdf payload, gzip payload
    for i in ids:
        row = gen_row(i)
        ext = "pdf" if row["html"][:1] == b"%" else (
            "gz" if row["html"][:2] == b"\x1f\x8b" else "html"
        )
        (d / f"page{i:05d}.{ext}").write_bytes(row["html"])
    # an ignored extension must be filtered by the glob
    (d / "notes.txt").write_bytes(b"not a page")

    docs = read_raw_pages(spark, str(d))
    assert docs.count() == len(ids)

    got = {
        os.path.basename(r["url"]): r["extracted_text"]
        for r in extract_all(docs.select("url", "html")).collect()
    }
    for i in ids:
        row = gen_row(i)
        ext = "pdf" if row["html"][:1] == b"%" else (
            "gz" if row["html"][:2] == b"\x1f\x8b" else "html"
        )
        want = golden_row(i)["extracted_text"]
        assert got[f"page{i:05d}.{ext}"] == want


def test_corpus_datasource_v2(spark):
    """The corpus as a registered Python DataSource: declared schema,
    planned partitions, Arrow-batch rows, byte-identical to the
    mapInPandas generator."""
    from win64_local_ocr_tool_spark.corpus import corpus_df
    from win64_local_ocr_tool_spark.sources import register_corpus_source

    register_corpus_source(spark)
    ds = (
        spark.read.format("synthetic_corpus")
        .option("n", 300)
        .option("partitions", 7)
        .load()
    )
    assert [f.name for f in ds.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    got = ds.toPandas().sort_values("url").reset_index(drop=True)
    want = corpus_df(spark, 300).toPandas().sort_values("url").reset_index(drop=True)
    assert len(got) == 300
    assert list(got["url"]) == list(want["url"])
    assert list(got["html"].map(bytes)) == list(want["html"].map(bytes))
