"""Single-process golden extractor — the byte-identity oracle.

Analog of the reference's qualitative golden loop (predicted vs
corrected text per line, ``annotationStore.js:141-195``): here the
ground truth for the Spark pipeline is the output of this plain,
sequential, one-document-at-a-time extractor over the deterministic
corpus. The pipeline must match it byte-for-byte per url at any
partitioning (SURVEY.md §5 item 1, north rule).

No Spark imports — this file must stay runnable as a plain script.
"""

from __future__ import annotations

from .corpus import SEED, gen_row
from .kernels.assemble import extract_document

GOLDEN_COLUMNS = ["url", "extracted_text", "spans", "lang", "status"]


def golden_row(i: int, seed: int = SEED) -> dict:
    row = gen_row(i, seed)
    res = extract_document(row["html"])
    return {
        "url": row["url"],
        "extracted_text": res["extracted_text"],
        "spans": [
            {"span_id": s[0], "char_start": s[1], "char_end": s[2]}
            for s in res["spans"]
        ],
        "lang": res["lang"],
        "status": res["status"],
    }


def golden_pandas(n: int, seed: int = SEED):
    import pandas as pd

    return pd.DataFrame(
        [golden_row(i, seed) for i in range(n)], columns=GOLDEN_COLUMNS
    )
