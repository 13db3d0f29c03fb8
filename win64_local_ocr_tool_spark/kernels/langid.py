"""Deterministic stopword/script language identification.

Analog of the reference's charset handling (the 189-char Devanagari+ASCII
recognition charset, ``recognition/recognition.py:44``): the extracted
text's language is re-detected from its content, exercising UTF-8 /
Devanagari byte-identity.

Counts are additive across document chunks, so the mega-page skew path
can sum per-chunk counts and apply ``lang_from_counts`` once per document
with a result identical to the single-process path.
"""

from __future__ import annotations

import re
from collections import Counter

# Marker stopwords per language. Matching is on whitespace-delimited
# tokens, lowercased for Latin scripts.
EN_MARKERS = frozenset("the and of to is in that with for on".split())
DE_MARKERS = frozenset("der die und das ist ein mit von zu nicht".split())
HI_MARKERS = frozenset("है और में की का से पर यह लिए हैं".split())
SA_MARKERS = frozenset("अस्ति इति च एव तु अपि भवति तत् किम् सः".split())

_DEVA = re.compile(r"[ऀ-ॿ]")
# Tokens = runs of letters OR Devanagari code points (incl. combining
# marks, which Python's \w excludes — they must stay inside the token
# for marker matching: 'है' is HA + vowel sign E). Each alternative
# consumes a RUN (+ inside the group): the maximal matches are
# identical, but char-at-a-time alternation is measurably slower.
# Inner quantifiers are POSSESSIVE (++): the alternatives OVERLAP
# (Devanagari letters are Unicode letters, so they match both
# branches), which makes the plain form the (A+)* catastrophic-
# backtracking shape — safe today only because nothing follows the
# outer +, but one future suffix away from exponential. Possessive
# runs never give back, so the pattern stays linear under any
# composition (same fix as htmlscan.py).
_TOKEN = re.compile(r"(?:[^\W\d_]++|[ऀ-ॿ]++)+", re.UNICODE)

COUNT_FIELDS = ("n_en", "n_de", "n_hi", "n_sa", "n_deva", "n_tokens")


def lang_counts(text: str) -> tuple[int, int, int, int, int, int]:
    """Marker counts for ``text``: (en, de, hi, sa, devanagari-tokens, tokens)."""
    n_en = n_de = n_hi = n_sa = n_deva = n_tok = 0
    # one whole-text precheck spares the per-token Devanagari scan on
    # pure-Latin documents (half the corpus)
    has_deva = _DEVA.search(text) is not None
    if not has_deva and text.isascii():
        # ASCII fast path: no per-token Python loop. For ASCII input,
        # str.lower() is a 1:1 letter-preserving map, so tokenizing the
        # pre-lowercased text yields exactly the token multiset of
        # lowercasing each token (NOT true in general: 'İ'.lower()
        # inserts a combining mark and splits a token — hence the
        # isascii() gate). Counter counts in C; EN/DE marker sets are
        # disjoint, so summing lookups equals the if/elif walk.
        toks = _TOKEN.findall(text.lower())
        c = Counter(toks)
        n_tok = len(toks)
        n_en = sum(c[m] for m in EN_MARKERS)
        n_de = sum(c[m] for m in DE_MARKERS)
        return (n_en, n_de, 0, 0, 0, n_tok)
    # walk path (non-ASCII input): keep the has_deva short-circuit so a
    # Latin document with umlauts never pays a per-token Devanagari scan
    deva_search = _DEVA.search
    for tok in _TOKEN.findall(text):
        n_tok += 1
        if has_deva and deva_search(tok):
            n_deva += 1
            if tok in HI_MARKERS:
                n_hi += 1
            elif tok in SA_MARKERS:
                n_sa += 1
        else:
            low = tok.lower()
            if low in EN_MARKERS:
                n_en += 1
            elif low in DE_MARKERS:
                n_de += 1
    return (n_en, n_de, n_hi, n_sa, n_deva, n_tok)


def lang_from_counts(counts) -> str:
    """Decide the language from (possibly chunk-summed) marker counts.

    Deterministic tie-breaks: Devanagari script wins if it covers >=30%
    of tokens; within it, 'sa' only on a strict marker majority. Latin:
    'de' only on a strict majority, else 'en'. Empty text -> 'und'.
    """
    n_en, n_de, n_hi, n_sa, n_deva, n_tok = (int(c) for c in counts)
    if n_tok == 0:
        return "und"
    if 10 * n_deva >= 3 * n_tok:
        return "sa" if n_sa > n_hi else "hi"
    return "de" if n_de > n_en else "en"


def detect_lang(text: str) -> str:
    return lang_from_counts(lang_counts(text))
