"""Ingest normalization kernel (SURVEY S2): decompression + charset
recovery, and its end-to-end behavior through extract_document."""

import codecs
import gzip
import zlib

from win64_local_ocr_tool_spark.corpus import gen_row
from win64_local_ocr_tool_spark.kernels.assemble import extract_document
from win64_local_ocr_tool_spark.kernels.ingest import (
    maybe_decompress,
    recode_to_utf8,
)

PAGE = (
    '<html><head><meta charset="windows-1252"><title>t</title></head>'
    "<body><p>Größe für Bäume — „Zitat“ 5 €</p></body></html>"
)


def test_gzip_roundtrip():
    raw = PAGE.encode("utf-8")
    out, codec = maybe_decompress(gzip.compress(raw, mtime=0))
    assert (out, codec) == (raw, "gzip")


def test_zlib_roundtrip():
    raw = PAGE.encode("utf-8")
    out, codec = maybe_decompress(zlib.compress(raw))
    assert (out, codec) == (raw, "zlib")


def test_plain_payload_untouched():
    raw = b"<html><body>hi</body></html>"
    assert maybe_decompress(raw) == (raw, "")


def test_truncated_gzip_passes_through():
    broken = gzip.compress(b"x" * 100, mtime=0)[:10]
    out, codec = maybe_decompress(broken)
    assert (out, codec) == (broken, "")


def test_recode_cp1252_with_meta():
    payload = PAGE.encode("windows-1252")
    # genuinely not utf-8
    try:
        payload.decode("utf-8")
        raise AssertionError("fixture must not be valid utf-8")
    except UnicodeDecodeError:
        pass
    assert recode_to_utf8(payload) == PAGE.encode("utf-8")


def test_recode_utf16_bom():
    payload = codecs.BOM_UTF16_LE + PAGE.encode("utf-16-le")
    assert recode_to_utf8(payload) == PAGE.encode("utf-8")
    payload = codecs.BOM_UTF16_BE + PAGE.encode("utf-16-be")
    assert recode_to_utf8(payload) == PAGE.encode("utf-8")


def test_noise_with_bom_is_rejected():
    """Corrupt rows start with xff xfe (= utf-16-le BOM); the markup
    gate must keep them on the error path."""
    assert recode_to_utf8(b"\xff\xfe" + bytes(range(2, 60))) is None


def test_no_evidence_no_recovery():
    # invalid utf-8, no BOM, no declared charset -> reject
    assert recode_to_utf8(b"<html>caf\xe9</html>") is None
    # declared utf-8 but broken bytes -> reject (do not guess)
    assert (
        recode_to_utf8(b'<meta charset="utf-8"><p>caf\xe9</p>') is None
    )


def test_extract_document_end_to_end_variants():
    """Compressed / recoded payloads extract the same text as their
    plain utf-8 twin; corrupt rows still error."""
    plain = extract_document(PAGE.encode("utf-8"))
    assert plain["status"] == "ok"
    for payload in (
        gzip.compress(PAGE.encode("utf-8"), mtime=0),
        PAGE.encode("windows-1252"),
        codecs.BOM_UTF16_LE + PAGE.encode("utf-16-le"),
        gzip.compress(PAGE.encode("windows-1252"), mtime=0),
    ):
        got = extract_document(payload)
        assert got == plain
    assert extract_document(gen_row(499)["html"])["status"] == "error"


def test_corpus_variant_rows_extract_ok():
    for i in (353, 379, 457, 706, 758, 914):
        row = gen_row(i)
        res = extract_document(row["html"])
        assert res["status"] == "ok", i
        assert res["extracted_text"], i
    # cp1252 rows carry chars that prove the recovery ran
    res = extract_document(gen_row(379)["html"])
    assert "€" in res["extracted_text"]


def test_decompression_bomb_is_contained():
    """A payload inflating past the cap stays compressed -> error row,
    not an executor OOM."""
    import io

    from win64_local_ocr_tool_spark.kernels import ingest

    # build a small zlib stream that inflates to > cap (patched low)
    orig = ingest.MAX_INFLATED_BYTES
    ingest.MAX_INFLATED_BYTES = 1 << 20  # 1 MiB for the test
    try:
        bomb = zlib.compress(b"\x00" * (8 << 20))  # 8 MiB of zeros
        out, codec = ingest.maybe_decompress(bomb)
        assert (out, codec) == (bomb, "")
        gz_bomb = gzip.compress(b"\x00" * (8 << 20), mtime=0)
        out, codec = ingest.maybe_decompress(gz_bomb)
        assert (out, codec) == (gz_bomb, "")
        assert extract_document(gz_bomb)["status"] == "error"
        # under the cap still inflates fine
        small = gzip.compress(b"<html><body><p>x</p></body></html>", mtime=0)
        out, codec = ingest.maybe_decompress(small)
        assert codec == "gzip"
    finally:
        ingest.MAX_INFLATED_BYTES = orig
