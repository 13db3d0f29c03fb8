"""Main-content classification over the block stream.

Web analog of the reference's majority-cluster / projection-profile line
grouping (``LayoutGraphGenerator.js:71-131`` DBSCAN majority cluster;
``segment_old_method.py:41-102`` peak-row assignment): decide, per
content unit, whether it belongs to the main body.

Deterministic integer arithmetic only (byte-identity discipline,
SURVEY.md §7.1). Two passes:

1. **raw pass** — a block is raw-content iff it is long enough, not
   link-dominated, and not inside an excluded semantic context
   (text-density + link-density rule, Boilerpipe/trafilatura-style).
2. **smoothing pass** (radius 1) — a short block sandwiched between two
   raw-content blocks is promoted (the "affinity" analog of the
   reference's inter-character affinity links, ``craft.py:271-272``).

The smoothing radius of 1 is what makes the mega-page chunk split exact:
a chunk classified with a 1-block halo on each side produces flags
identical to classifying the whole document (see ``classify_chunk`` and
SURVEY.md §7.5 item 3).
"""

from __future__ import annotations

from .htmlblocks import Block

# Integer thresholds (chars). A block is raw main content iff:
#   text_len >= MIN_CONTENT_LEN  AND  3*link_text_len <= text_len
MIN_CONTENT_LEN = 30
# Smoothing promotion: sandwiched block qualifies iff:
#   text_len >= MIN_SANDWICH_LEN  AND  2*link_text_len <= text_len
MIN_SANDWICH_LEN = 10


def _raw_flag(b: Block) -> bool:
    return (
        not b.excluded
        and b.text_len >= MIN_CONTENT_LEN
        and 3 * b.link_text_len <= b.text_len
    )


def _smooth(blocks: list[Block], raw: list[bool]) -> list[bool]:
    out = list(raw)
    for i, b in enumerate(blocks):
        if raw[i] or b.excluded:
            continue
        left = raw[i - 1] if i > 0 else False
        right = raw[i + 1] if i + 1 < len(blocks) else False
        if (
            left
            and right
            and b.text_len >= MIN_SANDWICH_LEN
            and 2 * b.link_text_len <= b.text_len
        ):
            out[i] = True
    return out


def classify_blocks(blocks: list[Block]) -> list[bool]:
    """Whole-document classification. True = main content."""
    raw = [_raw_flag(b) for b in blocks]
    return _smooth(blocks, raw)


def classify_chunk(
    core: list[Block],
    left_halo: Block | None,
    right_halo: Block | None,
) -> list[bool]:
    """Classify one chunk of a split mega-document.

    ``left_halo``/``right_halo`` are the single blocks adjacent to the
    chunk in the full document (None at document edges). Because the
    smoothing radius is 1, flags computed here equal the corresponding
    slice of ``classify_blocks(whole_document)`` — property-tested in
    ``tests/test_skew_chunks.py``.
    """
    padded = ([left_halo] if left_halo else []) + core + (
        [right_halo] if right_halo else []
    )
    raw = [_raw_flag(b) for b in padded]
    smoothed = _smooth(padded, raw)
    start = 1 if left_halo else 0
    return smoothed[start : start + len(core)]
