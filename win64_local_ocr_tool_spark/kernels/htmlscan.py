"""Fast regex-based HTML block scanner — same observable behavior as
the ``html.parser``-based tokenizer, ~5x faster.

The per-document parse is the engine's hottest loop (the analog of the
reference's CRAFT forward pass, its P3/P5 batching tactics); stdlib
HTMLParser spends most of its time in generic machinery this pipeline
never uses (attribute parsing, charref positions, pos tracking).
Equivalence with ``htmlblocks.tokenize_html`` on the corpus shapes is
pinned by tests/test_kernels.py::test_scan_equals_htmlparser.
"""

from __future__ import annotations

import html as _html
import re
import unicodedata

from .htmlblocks import BLOCK_TAGS, SKIP_TAGS, Block

# One pass: tags, comments, declarations. Attribute bodies are skipped,
# never parsed (the classifier uses only tag names + text). The first
# attribute-skipping alternative consumes RUNS of plain chars — and it
# MUST be possessive ([^>"']++): a backtrackable [^>"']+ inside (?:…)*
# is the classic (A+)* catastrophic-backtracking shape, which hangs for
# seconds on any unclosed `<tag …` run (truncated crawl pages, bare
# `a<b` prose). Possessive is exactly equivalent here because the
# alternatives have disjoint first characters and none can consume the
# closing `>`, so no giveback can ever enable a match that greedy
# matching missed. Run-consumption itself is ~2x faster than
# char-at-a-time alternation on attribute-heavy tags.
_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)(?:[^>\"']++|\"[^\"]*\"|'[^']*')*>"
    r"|<!--.*?-->"
    r"|<![^>]*>",
    re.DOTALL,
)

# CDATA-content elements (the ONLY raw-text bodies, mirroring
# html.parser.HTMLParser.CDATA_CONTENT_ELEMENTS): their body ends only
# at a well-formed close tag — case-insensitive, optional whitespace,
# NO attributes and no name continuation (`</scriptfoo>` and
# `</script x=1>` stay inside CDATA, exactly like HTMLParser).
_CDATA_TAGS = frozenset({"script", "style"})
_CDATA_CLOSE = {
    t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE) for t in _CDATA_TAGS
}
# Remaining skip tags (noscript/template): NOT raw text — tags inside
# them still mutate the tag/link stacks (HTMLParser parses them); only
# their character data is suppressed.
_FLAG_SKIP_TAGS = SKIP_TAGS - _CDATA_TAGS

def _norm(raw: str) -> str:
    if "&" in raw:
        raw = _html.unescape(raw)
    text = " ".join(raw.split())
    if text and not text.isascii():
        text = unicodedata.normalize("NFC", text)
    return text


def scan_html(payload: bytes) -> list[Block]:
    """Drop-in replacement for ``htmlblocks.tokenize_html``."""
    try:
        text = payload.decode("utf-8", errors="strict")
    except UnicodeDecodeError as exc:
        raise ValueError(f"undecodable payload: {exc}") from None

    blocks: list[Block] = []
    buf: list[str] = []
    link_buf: list[str] = []
    tag_stack: list[str] = []
    link_depth = 0
    skip_depth = 0  # inside noscript/template: suppress text, keep tags
    pos = 0

    def flush() -> None:
        nonlocal pos
        if not buf:
            link_buf.clear()
            return
        t = _norm("".join(buf))
        lt = _norm("".join(link_buf)) if link_buf else ""
        buf.clear()
        link_buf.clear()
        if not t:
            return
        blocks.append(
            Block(
                block_id=len(blocks),
                tag=tag_stack[-1] if tag_stack else "body",
                depth=len(tag_stack),
                pos=pos,
                text=t,
                text_len=len(t),
                link_text_len=min(len(lt), len(t)),
            )
        )
        pos += len(t) + 1

    i = 0
    n = len(text)
    tag_search = _TAG_RE.search  # bind once: the loop runs per tag
    while i < n:
        m = tag_search(text, i)
        if m is None:
            data = text[i:]
            if data and not skip_depth:
                buf.append(data)
                if link_depth:
                    link_buf.append(data)
            break
        start, end = m.span()
        if start > i and not skip_depth:
            data = text[i:start]
            buf.append(data)
            if link_depth:
                link_buf.append(data)
        i = end
        tag = m[2]
        if not tag:  # comment / declaration
            continue
        tag = tag.lower()
        closing = m[1] == "/"
        if tag in _CDATA_TAGS:
            if not closing:
                # raw-skip to the well-formed close tag (CDATA mode)
                mc = _CDATA_CLOSE[tag].search(text, i)
                i = mc.end() if mc else n
            continue
        if tag in _FLAG_SKIP_TAGS:
            skip_depth = max(0, skip_depth - 1) if closing else skip_depth + 1
            continue
        if tag == "a":
            link_depth = max(0, link_depth - 1) if closing else link_depth + 1
            continue
        if tag in BLOCK_TAGS:
            flush()
            if closing:
                if tag in tag_stack:
                    while tag_stack and tag_stack[-1] != tag:
                        tag_stack.pop()
                    if tag_stack:
                        tag_stack.pop()
            elif tag not in ("br", "hr"):
                tag_stack.append(tag)
    flush()
    return blocks
