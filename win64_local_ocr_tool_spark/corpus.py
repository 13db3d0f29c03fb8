"""Deterministic synthetic Common-Crawl-style corpus.

One web page per row, schema per BASELINE.json ``input_hint`` /
FIXTURES.md §1::

    documents(url string, warc_ts timestamp, html binary, text string,
              lang string)

Every row is generated from ``(seed, i)`` alone (``random.Random`` seeded
with a per-row string — sha512-based, stable across processes), so
generation is embarrassingly parallel: the Spark path generates any id
range on any executor and produces byte-identical rows. No wall-clock,
no external data.

Row mix (FIXTURES.md §1):
- every 499th row: corrupt bytes (error-row path, cf. reference
  ``dataset.py:203-210``)
- every 211th row: synthetic-PDF glyph payload (fallback path)
- every 997th row: mega-page ~50-100x median size (skew-split path,
  cf. tall-box splitting ``segment_old_method.py:23-37``)
- every 353rd row: gzip-compressed page (ingest decompression, S2)
- every 379th row: windows-1252 page with declared meta charset
  (charset recovery, S2)
- every 457th row: utf-16-LE page with BOM (charset recovery, S2)
- otherwise: templated HTML with link-dense boilerplate around
  main-content paragraphs (the reference's "diverse layouts",
  ``README.md:8``).

``CORPUS_VERSION`` keys every on-disk corpus cache — bump it whenever
generation changes so stale parquet can never masquerade as current.
"""

from __future__ import annotations

import codecs
import datetime as _dt
import gzip
import random
import unicodedata

from .kernels.htmlblocks import tokenize_html
from .kernels.pdfglyphs import parse_pdf_payload, render_pdf_payload

SEED = 42
CORPUS_VERSION = 2
EPOCH = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)

LANGS = ("en", "hi", "de", "sa")

_WORDS = {
    "en": (
        "the and of to is in that with for on river mountain harvest "
        "library copper season journey window garden evening thunder "
        "market bridge lantern meadow castle farmer winter stone"
    ).split(),
    "de": (
        "der die und das ist ein mit von zu nicht fluss berg ernte "
        "bibliothek kupfer jahreszeit reise fenster garten abend donner "
        "markt brücke laterne wiese schloss bauer winter stein"
    ).split(),
    "hi": (
        "है और में की का से पर यह लिए हैं नदी पर्वत पुस्तकालय बाज़ार सेतु "
        "उद्यान सन्ध्या वर्षा किसान पत्थर दीपक खिड़की यात्रा"
    ).split(),
    "sa": (
        "अस्ति इति च एव तु अपि भवति तत् किम् सः नदी पर्वतः ग्रन्थालयः "
        "विपणिः सेतुः उद्यानम् सन्ध्या वर्षा कृषकः शिला दीपः वातायनम्"
    ).split(),
}

_LINK_WORDS = {
    "en": "home about news archive contact search tags login help docs".split(),
    "de": "start über neues archiv kontakt suche themen anmelden hilfe".split(),
    "hi": "मुखपृष्ठ परिचय समाचार संग्रह संपर्क खोज विषय सहायता".split(),
    "sa": "मुखपृष्ठम् परिचयः वार्ता संग्रहः सम्पर्कः अन्वेषणम् साहाय्यम्".split(),
}


def _nfc(s: str) -> str:
    return unicodedata.normalize("NFC", s)


def _sentence(rng: random.Random, lang: str) -> str:
    words = _WORDS[lang]
    n = rng.randint(5, 12)
    toks = [rng.choice(words) for _ in range(n)]
    s = " ".join(toks)
    if lang in ("en", "de"):
        s = s[0].upper() + s[1:]
    return s + ("।" if lang in ("hi", "sa") else ".")


def _paragraph(rng: random.Random, lang: str) -> str:
    return " ".join(_sentence(rng, lang) for _ in range(rng.randint(2, 5)))


def _links(rng: random.Random, lang: str, n: int) -> str:
    lw = _LINK_WORDS[lang]
    return " ".join(
        f'<a href="/{i}">{rng.choice(lw)}</a>' for i in range(n)
    )


def _html_page_text(
    rng: random.Random, lang: str, n_paras: int
) -> tuple[str, list[str]]:
    """Returns (page text, intended-main-paragraphs). The second element
    is the generator's intent — what a correct extractor should recover —
    used only by sanity tests (golden truth itself is the single-process
    extractor's output, FIXTURES.md §2)."""
    title = " ".join(rng.choice(_WORDS[lang]) for _ in range(rng.randint(3, 6)))
    parts = [
        "<html><head><title>", title, "</title>",
        '<style>body{margin:0}</style></head><body>',
        '<div class="nav">', _links(rng, lang, rng.randint(5, 10)), "</div>",
    ]
    parts.append('<div class="main">')
    mains: list[str] = []
    for _ in range(n_paras):
        para = _nfc(_paragraph(rng, lang))
        mains.append(para)
        parts.append(f"<p>{para}</p>")
        if rng.random() < 0.15:  # footnote-ish short link block between paras
            parts.append(
                f'<p class="fn">[{rng.randint(1, 9)}] '
                f'<a href="/ref">{rng.choice(_LINK_WORDS[lang])}</a></p>'
            )
    parts.append("</div>")
    if rng.random() < 0.3:  # sidebar: short link list
        parts.append('<div class="side"><ul>')
        for _ in range(rng.randint(3, 5)):
            parts.append(f'<li><a href="/s">{rng.choice(_LINK_WORDS[lang])}</a></li>')
        parts.append("</ul></div>")
    if rng.random() < 0.2:  # data table: short cells
        parts.append("<table>")
        for _ in range(2):
            parts.append("<tr>")
            for _ in range(3):
                parts.append(f"<td>{rng.choice(_WORDS[lang])[:12]}</td>")
            parts.append("</tr>")
        parts.append("</table>")
    parts.append('<div class="footer">')
    parts.append(_links(rng, lang, rng.randint(3, 6)))
    parts.append(f"<p>© 2025 {rng.choice(_WORDS[lang])}</p></div></body></html>")
    return _nfc("".join(parts)), mains


def _html_page(rng: random.Random, lang: str, n_paras: int) -> tuple[bytes, list[str]]:
    text, mains = _html_page_text(rng, lang, n_paras)
    return text.encode("utf-8"), mains


def _pdf_page(rng: random.Random, lang: str) -> bytes:
    lines = [
        _nfc(" ".join(rng.choice(_WORDS[lang]) for _ in range(rng.randint(4, 9))))
        for _ in range(rng.randint(3, 8))
    ]
    jit = [[rng.randint(-4, 4) for _ in range(120)] for _ in range(len(lines))]

    def jitter(li: int, ci: int) -> int:
        return jit[li][ci % 120]

    return render_pdf_payload(lines, jitter=jitter)


def _corrupt(rng: random.Random) -> bytes:
    # 0xff is never valid UTF-8 and is not the SPDF magic.
    return b"\xff\xfe" + bytes(rng.randrange(256) for _ in range(rng.randint(16, 64)))


def gen_row_with_intent(i: int, seed: int = SEED) -> tuple[dict, list[str]]:
    """Generate row ``i`` plus the intended main-content units.

    Pure function of (seed, i). For PDF rows the intent is the layout
    lines; for corrupt rows it is empty.
    """
    rng = random.Random(f"corpus:{seed}:{i}")
    lang = LANGS[i % 4]
    url = f"https://site{i % 1000:04d}.example/p/{i:08d}"
    ts = EPOCH + _dt.timedelta(seconds=i * 137)
    intent: list[str] = []
    if i % 499 == 0 and i > 0:
        html = _corrupt(rng)
        visible = ""
    elif i % 211 == 0 and i > 0:
        html = _pdf_page(rng, lang)
        intent = parse_pdf_payload(html)
        visible = " ".join(intent)
    elif i % 997 == 0 and i > 0:
        html, intent = _html_page(rng, lang, n_paras=rng.randint(250, 400))
        visible = " ".join(b.text for b in tokenize_html(html))
    elif i % 353 == 0 and i > 0:
        # gzip transport compression (ingest decompression path, S2);
        # mtime=0 keeps the member header deterministic
        text, intent = _html_page_text(rng, lang, n_paras=rng.randint(1, 12))
        utf8 = text.encode("utf-8")
        html = gzip.compress(utf8, mtime=0)
        visible = " ".join(b.text for b in tokenize_html(utf8))
    elif i % 379 == 0 and i > 0:
        # legacy single-byte charset with declared <meta charset=...>
        # (charset recovery path, S2); forced to de — cp1252 cannot
        # encode Devanagari, and de text carries multi-byte umlauts so
        # the cp1252 bytes are genuinely NOT valid utf-8
        lang = "de"
        text, intent = _html_page_text(rng, lang, n_paras=rng.randint(1, 8))
        text = text.replace(
            "<head>", '<head><meta charset="windows-1252">', 1
        )
        quote_text = _nfc(f"Größe für Bäume — „{rng.choice(_WORDS['de'])}“ 5 €")
        text = text.replace(
            '<div class="main">', f'<div class="main"><p>{quote_text}</p>', 1
        )
        intent.insert(0, quote_text)
        html = text.encode("windows-1252")
        visible = " ".join(b.text for b in tokenize_html(text.encode("utf-8")))
    elif i % 457 == 0 and i > 0:
        # utf-16-LE with BOM (charset recovery path, S2)
        text, intent = _html_page_text(rng, lang, n_paras=rng.randint(1, 10))
        html = codecs.BOM_UTF16_LE + text.encode("utf-16-le")
        visible = " ".join(b.text for b in tokenize_html(text.encode("utf-8")))
    else:
        html, intent = _html_page(rng, lang, n_paras=rng.randint(1, 12))
        visible = " ".join(b.text for b in tokenize_html(html))
    row = {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": visible,
        "lang": lang,
    }
    return row, intent


def gen_row(i: int, seed: int = SEED) -> dict:
    """Generate row ``i`` of the corpus. Pure function of (seed, i)."""
    return gen_row_with_intent(i, seed)[0]


def corpus_pandas(ids, seed: int = SEED):
    """Rows for an id iterable as a pandas DataFrame (Arrow-friendly)."""
    import pandas as pd

    rows = [gen_row(int(i), seed) for i in ids]
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )


DOCUMENTS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def corpus_df(spark, n: int, seed: int = SEED, partitions: int | None = None):
    """Distributed corpus generation: ``spark.range(n)`` -> mapInPandas.

    Per-row seeding makes the output independent of partitioning —
    the same property the extraction pipeline itself must hold.
    """
    parts = partitions or spark.sparkContext.defaultParallelism * 2
    base = spark.range(0, n, 1, parts)

    def gen(batches):
        for pdf in batches:
            yield corpus_pandas(pdf["id"].tolist(), seed)

    return base.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)
