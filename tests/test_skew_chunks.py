"""Skew path: mega-page chunk split/reassembly preserves span offsets
across chunk boundaries (SURVEY.md §7.5 item 3 — the classic off-by-one
lives at the boundary; test chunk sizes around it)."""

import pytest

from win64_local_ocr_tool_spark.corpus import corpus_df, gen_row
from win64_local_ocr_tool_spark.kernels.assemble import extract_document
from win64_local_ocr_tool_spark.operators.extract import extract_all, extract_mega

MEGA_I = 997  # first mega row in the corpus


@pytest.mark.parametrize("chunk_blocks", [1, 2, 3, 7, 199, 200, 201, 10_000])
def test_mega_chunk_sizes_boundary(spark, chunk_blocks):
    row = gen_row(MEGA_I)
    want = extract_document(row["html"])

    docs = spark.createDataFrame(
        [(row["url"], row["html"])], schema="url string, html binary"
    )
    got = extract_mega(docs, chunk_blocks=chunk_blocks).collect()[0]

    assert got["extracted_text"] == want["extracted_text"]
    assert got["lang"] == want["lang"]
    assert got["status"] == want["status"]
    got_spans = [
        (s["span_id"], s["char_start"], s["char_end"]) for s in got["spans"]
    ]
    assert got_spans == want["spans"]
    # offsets really slice the text
    for sid, a, b in got_spans:
        assert got["extracted_text"][a:b] + "\n" == got["extracted_text"][a : b + 1]


def test_mega_path_handles_pdf_and_corrupt(spark):
    """Payload-type dispatch inside the skew path: PDF and corrupt rows
    routed through it still behave (single chunk / error row)."""
    rows = [gen_row(i) for i in (211, 499, 1)]
    docs = spark.createDataFrame(
        [(r["url"], r["html"]) for r in rows], schema="url string, html binary"
    )
    got = {r["url"]: r for r in extract_mega(docs, chunk_blocks=3).collect()}
    for r in rows:
        want = extract_document(r["html"])
        g = got[r["url"]]
        assert g["status"] == want["status"]
        assert g["extracted_text"] == want["extracted_text"]
        assert g["lang"] == want["lang"]


def test_true_giant_document(spark):
    """A multi-MB document (the real reason the distributed path
    exists) goes through chunk split/reassembly byte-identically."""
    from win64_local_ocr_tool_spark.corpus import _html_page, _nfc
    import random

    rng = random.Random("giant:1")
    html, intent = _html_page(rng, "en", n_paras=25_000)  # ~5 MB
    assert len(html) > 4 << 20
    want = extract_document(html)
    assert want["extracted_text"] == "".join(t + "\n" for t in intent)

    docs = spark.createDataFrame(
        [("https://giant.example/1", html)], schema="url string, html binary"
    )
    got = extract_mega(docs, chunk_blocks=500).collect()[0]
    assert got["extracted_text"] == want["extracted_text"]
    assert len(got["spans"]) == len(want["spans"]) == 25_000
    assert got["lang"] == want["lang"] == "en"


def test_lang_expr_matches_kernel_on_ties(spark):
    """The JVM-side lang pick (``lang_from_counts_expr``) must agree
    with the Python kernel on EVERY branch boundary — exact ties on
    de/en and sa/hi majorities and on the 30%-Devanagari threshold are
    where a reimplementation would drift."""
    from itertools import product

    from win64_local_ocr_tool_spark.kernels.langid import (
        COUNT_FIELDS,
        lang_from_counts,
    )
    from win64_local_ocr_tool_spark.operators.extract import (
        lang_from_counts_expr,
    )

    cases = []
    # boundary grid: small counts hit every comparison's ==, <, > side
    for n_en, n_de, n_hi, n_sa in product(range(3), repeat=4):
        for n_deva, n_tok in [(0, 0), (0, 5), (3, 10), (2, 10), (4, 10),
                              (3, 9), (1, 1), (10, 10)]:
            cases.append((n_en, n_de, n_hi, n_sa, n_deva, n_tok))
    df = spark.createDataFrame(
        cases, schema=", ".join(f"{f} long" for f in COUNT_FIELDS)
    )
    got = df.select(*COUNT_FIELDS, lang_from_counts_expr().alias("lang")).collect()
    for r in got:
        counts = tuple(r[f] for f in COUNT_FIELDS)
        assert r["lang"] == lang_from_counts(counts), counts


def test_dispatch_routes_by_size(spark):
    """extract_all with distributed skew enabled: the union of both
    paths covers every input exactly once."""
    docs = corpus_df(spark, 1100)
    out = extract_all(docs, mega_bytes=65536)
    assert out.count() == 1100
    assert out.select("url").distinct().count() == 1100


def test_default_single_path_matches_dual_path(spark):
    """Default (in-task) and distributed-skew plans produce identical
    rows — the dispatch threshold is a physical choice, not semantic."""
    docs = corpus_df(spark, 1100)
    a = extract_all(docs).orderBy("url").collect()
    b = extract_all(docs, mega_bytes=65536).orderBy("url").collect()
    assert a == b
