"""Synthetic-PDF glyph-box payload: render + parse + line clustering.

This is the binary/layout fallback path — the direct analog of the
reference's point-cloud -> line assembly
(``segment_from_point_clusters.py:47-134``: assign glyph boxes to lines,
order lines top-to-bottom, order glyphs left-to-right within a line).

The container image has no real PDF library (pdfminer etc.), so the
payload format is a deterministic fake defined here (per the task brief:
"stub the decode step ... make the Spark-side plumbing real"). The
*clustering math* — 1-D y-gap segmentation into reading-order lines,
x-sort within a line — is the real algorithm the reference applies to
character boxes, just over a trivially-parseable container.

Format (ASCII, line-oriented)::

    %SPDF1\n
    G <x> <y> <w> <h> <utf8-hex-of-char>\n   (one per glyph)

Glyphs are clustered into lines wherever the sorted-y gap exceeds
``LINE_GAP`` (the analog of the p80 inter-peak gap threshold,
``segment_old_method.py:19``).
"""

from __future__ import annotations

PDF_MAGIC = b"%SPDF1\n"

# y-gap (in layout units) that separates two lines. Glyph y-jitter in
# the corpus generator is kept well below this.
LINE_GAP = 12
# x-gap (beyond the glyph box) that reads as a word space. Adjacent
# glyphs leave ADVANCE - GLYPH_W = 2; a skipped space cell leaves
# 2*ADVANCE - GLYPH_W = 11.
SPACE_GAP = 6
ADVANCE = 9
GLYPH_W = 7


def render_pdf_payload(lines: list[str], *, y0: int = 100, line_height: int = 30,
                       jitter=None) -> bytes:
    """Lay out ``lines`` of text as glyph boxes and serialize.

    ``jitter``: optional callable ``(line_idx, char_idx) -> dy`` with
    \\|dy\\| < LINE_GAP/2, used by the corpus generator to make the y
    clustering non-trivial while keeping it deterministic.
    """
    out = [PDF_MAGIC.decode("ascii")]
    for li, line in enumerate(lines):
        y = y0 + li * line_height
        x = 50
        for ci, ch in enumerate(line):
            dy = jitter(li, ci) if jitter else 0
            if ch != " ":
                hexed = ch.encode("utf-8").hex()
                out.append(f"G {x} {y + dy} {GLYPH_W} {line_height - 10} {hexed}\n")
            x += ADVANCE
    return "".join(out).encode("ascii")


def parse_pdf_payload(payload: bytes) -> list[str]:
    """Parse glyph boxes and assemble reading-order text lines.

    Returns the list of line strings (top-to-bottom; glyphs
    left-to-right within a line, single space inserted at gaps wider
    than ``SPACE_GAP``). Raises ``ValueError`` on malformed payloads.
    """
    if not payload.startswith(PDF_MAGIC):
        raise ValueError("not an SPDF payload")
    glyphs: list[tuple[int, int, int, str]] = []  # (y, x, w, char)
    for raw in payload[len(PDF_MAGIC):].decode("ascii").splitlines():
        if not raw:
            continue
        parts = raw.split()
        if len(parts) != 6 or parts[0] != "G":
            raise ValueError(f"bad glyph record: {raw!r}")
        x, y, w = int(parts[1]), int(parts[2]), int(parts[3])
        ch = bytes.fromhex(parts[5]).decode("utf-8")
        glyphs.append((y, x, w, ch))
    if not glyphs:
        return []

    # 1-D y clustering: sort by y, split where the gap exceeds LINE_GAP.
    glyphs.sort(key=lambda g: (g[0], g[1]))
    lines: list[list[tuple[int, int, int, str]]] = [[glyphs[0]]]
    for prev, cur in zip(glyphs, glyphs[1:]):
        if cur[0] - prev[0] > LINE_GAP:
            lines.append([cur])
        else:
            lines[-1].append(cur)

    # Reading order: lines already top-to-bottom (mean y increases);
    # within a line sort by x, re-insert word spaces at wide gaps.
    out: list[str] = []
    for line in lines:
        line.sort(key=lambda g: (g[1], g[0]))
        buf: list[str] = []
        prev_end: int | None = None
        for y, x, w, ch in line:
            if prev_end is not None and x - prev_end > SPACE_GAP:
                buf.append(" ")
            buf.append(ch)
            prev_end = x + w
        out.append("".join(buf))
    return out
