"""Deterministic compute kernels (pure Python + numpy, no Spark).

These are the analogs of the reference tool's detection / segmentation /
recognition kernels (see SURVEY.md §2.10). They are imported both by the
single-process golden extractor (``golden.py``) and by the Spark
vectorized UDFs (``operators/extract.py``), which is what makes the
byte-identity requirement testable: the Spark pipeline must reproduce the
single-process composition exactly, across any partitioning.
"""

from .htmlblocks import Block, tokenize_html
from .classify import classify_blocks, classify_chunk
from .pdfglyphs import PDF_MAGIC, parse_pdf_payload, render_pdf_payload
from .langid import lang_counts, lang_from_counts, detect_lang
from .assemble import (
    extract_document,
    tokenize_payload,
    spans_from_flags,
)

__all__ = [
    "Block",
    "tokenize_html",
    "classify_blocks",
    "classify_chunk",
    "PDF_MAGIC",
    "parse_pdf_payload",
    "render_pdf_payload",
    "lang_counts",
    "lang_from_counts",
    "detect_lang",
    "extract_document",
    "tokenize_payload",
    "spans_from_flags",
]
