"""Payload normalization kernel (SURVEY S2): transport decompression +
charset recovery, shared by the golden extractor and the Spark stages.

Reference analog: upload ingest mode-normalization — any wire format
(RGBA/P/LA) is re-encoded to the one canonical representation before
parsing (``routes.py:63-81``). Here the canonical form is utf-8 bytes;
the wire variants are gzip/zlib transport compression, utf-16 BOM
payloads, and legacy single-byte charsets declared via ``<meta
charset=...>``.

Cost discipline (this sits on the 10^12-doc hot path):

- decompression detection is a 2-byte magic compare — plain payloads
  pay nothing;
- charset recovery runs ONLY after a strict utf-8 decode has already
  failed (the overwhelming majority of pages never reach it);
- recovery is gated on positive evidence (utf-16 BOM, or an explicit
  meta-charset declaration) plus a looks-like-markup check, so corrupt
  byte-noise payloads still land on the error-row path instead of
  silently decoding as mojibake (failure containment, analog of the
  corrupted-image dummies, ``dataset.py:203-210``).

All pure stdlib and deterministic — required for byte-identity between
the Spark pipeline and ``golden.py`` at any partitioning.
"""

from __future__ import annotations

import codecs
import re
import zlib

GZIP_MAGIC = b"\x1f\x8b"

# Decompression-bomb ceiling: a payload may not inflate beyond this.
# Anything larger is returned compressed, which then fails strict utf-8
# and charset recovery -> error row (containment, not a crash). 256 MiB
# is far above any real page yet well inside one Python worker's RAM.
MAX_INFLATED_BYTES = 256 << 20


def _bounded_inflate(payload: bytes, wbits: int) -> bytes | None:
    """Inflate with a hard output cap; None = invalid, truncated, or
    over cap (unlike gzip.decompress, decompressobj does not raise on a
    truncated stream — d.eof distinguishes complete from cut-off)."""
    d = zlib.decompressobj(wbits)
    try:
        out = d.decompress(payload, MAX_INFLATED_BYTES)
        if d.unconsumed_tail:  # would exceed the cap
            return None
        out += d.flush()
        if not d.eof or len(out) > MAX_INFLATED_BYTES:
            return None
        return out
    except zlib.error:
        return None

# declared charset in the head: <meta charset=X> or http-equiv content=
_META_CHARSET_RE = re.compile(
    rb"charset\s*=\s*[\"']?\s*([A-Za-z0-9_\-]+)", re.IGNORECASE
)
# markup evidence: an element open/close/doctype near the document start
_MARKUP_RE = re.compile(r"<\s*[!/]?[a-zA-Z]")

_UTF8_ALIASES = frozenset({"utf-8", "utf8", "ascii", "us-ascii"})


def maybe_decompress(payload: bytes) -> tuple[bytes, str]:
    """Undo transport compression -> (payload, codec|'').

    gzip by magic; raw zlib by the RFC1950 header checksum (first two
    bytes as big-endian int divisible by 31 with CM=8). A payload that
    matches a magic but fails to inflate — or would inflate past
    MAX_INFLATED_BYTES (decompression bomb) — is returned unchanged;
    the downstream parser then lands it on the error-row path.
    """
    if payload[:2] == GZIP_MAGIC:
        out = _bounded_inflate(payload, 16 + zlib.MAX_WBITS)
        return (out, "gzip") if out is not None else (payload, "")
    if (
        len(payload) >= 2
        and (payload[0] & 0x0F) == 8
        and ((payload[0] << 8) | payload[1]) % 31 == 0
    ):
        out = _bounded_inflate(payload, zlib.MAX_WBITS)
        return (out, "zlib") if out is not None else (payload, "")
    return payload, ""


def recode_to_utf8(payload: bytes) -> bytes | None:
    """Charset recovery for a payload that is NOT valid utf-8.

    Returns utf-8 bytes, or None when there is no trustworthy evidence
    of an alternate charset (the caller emits an error row). Evidence
    accepted, in order:

    1. utf-16 LE/BE byte-order mark;
    2. an explicit ``charset=`` declaration in the first 4 KiB that
       names a decodable, non-utf-8 codec.

    Either way the decoded text must look like markup (``_MARKUP_RE``
    within the first 256 chars) — random bytes that happen to carry a
    utf-16 BOM (e.g. this corpus's corrupt rows) are rejected.
    """
    if payload.startswith(codecs.BOM_UTF16_LE):
        enc, body = "utf-16-le", payload[2:]
    elif payload.startswith(codecs.BOM_UTF16_BE):
        enc, body = "utf-16-be", payload[2:]
    else:
        m = _META_CHARSET_RE.search(payload[:4096])
        if m is None:
            return None
        enc = m.group(1).decode("ascii").lower()
        if enc in _UTF8_ALIASES:
            return None  # declared utf-8 but strict decode failed
        try:
            codecs.lookup(enc)
        except LookupError:
            return None
        body = payload
    try:
        text = body.decode(enc)
    except (UnicodeDecodeError, LookupError):
        return None
    if not _MARKUP_RE.search(text[:256]):
        return None
    return text.encode("utf-8")
