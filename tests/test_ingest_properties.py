"""Property tests (hypothesis) for the ingest kernel: any page text must
extract identically through every wire encoding, and arbitrary byte
noise must never crash or silently extract."""

import codecs
import gzip
import zlib

from hypothesis import given, settings, strategies as st

from win64_local_ocr_tool_spark.kernels.assemble import extract_document

# visible text fragments: printable unicode without markup chars
_frag = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), blacklist_characters="<>&"
    ),
    min_size=1,
    max_size=40,
)


@st.composite
def pages(draw):
    paras = draw(st.lists(_frag, min_size=1, max_size=5))
    body = "".join(f"<p>{p}</p>" for p in paras)
    return (
        '<html><head><meta charset="utf-8"><title>t</title></head>'
        f"<body><div class=\"main\">{body}</div></body></html>"
    )


@given(pages())
@settings(max_examples=60, deadline=None)
def test_wire_encodings_extract_identically(page):
    plain = extract_document(page.encode("utf-8"))
    variants = [
        gzip.compress(page.encode("utf-8"), mtime=0),
        zlib.compress(page.encode("utf-8")),
        codecs.BOM_UTF16_LE + page.encode("utf-16-le"),
        codecs.BOM_UTF16_BE + page.encode("utf-16-be"),
    ]
    for v in variants:
        assert extract_document(v) == plain


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=120, deadline=None)
def test_arbitrary_bytes_never_crash(payload):
    res = extract_document(payload)
    assert res["status"] in ("ok", "error")
    if res["status"] == "error":
        assert res["extracted_text"] == "" and res["spans"] == []
