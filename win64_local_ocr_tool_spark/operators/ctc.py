"""CTC beam-search decode as a Spark operator (SURVEY §2.8 C3).

The kernel (``kernels/ctcbeam.py``) restates the reference's prefix
beam search (``finetune/utils.py:74-166``); this module gives it the
engine surface: a ``mapInPandas`` batch decode over per-document
lattices. The testdata tables carry no probability lattices, so the
registry entry derives one deterministically per document (a pure
function of the text bytes) — the POINT under test is the decoder and
its Spark plumbing, and the derivation keeps the driver check
reproducible across runs, partitionings and engines. Rows-only by
contract: sequential per-prefix state has no ANSI-SQL twin (the
greedy-collapse special case is the relational ``c2_collapse_runs``);
exactness vs the brute-force all-paths oracle is pytest-gated
(tests/test_ctc.py).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .registry import query
from .tables import load

CLASSES = "-abcd"  # index 0 = CTC blank
N_CLASSES = len(CLASSES)
BEAM_WIDTH = 8


def lattice_from_text(text: str) -> np.ndarray:
    """Deterministic T x C probability lattice from the text bytes:
    an iterated-sha256 byte stream (NOT numpy's Generator — bit-stream
    stability across numpy versions is not guaranteed, so deriving the
    cells straight from the digest chain keeps the driver rows
    reproducible under ANY numpy), rows normalized to sum 1. Pure
    function of the text — byte-identical on any executor/engine."""
    digest = hashlib.sha256(text.encode("utf-8")).digest()
    T = 10 + digest[0] % 7
    need = T * N_CLASSES  # 2 digest bytes -> one lattice cell
    stream = bytearray()
    block = digest
    while len(stream) < 2 * need:
        block = hashlib.sha256(block).digest()
        stream.extend(block)
    cells = np.frombuffer(bytes(stream[: 2 * need]), dtype=">u2")
    mat = cells.astype(np.float64).reshape(T, N_CLASSES) / 65535.0 + 0.05
    return mat / mat.sum(axis=1, keepdims=True)


def ctc_decode_documents(docs: DataFrame, beam_width: int = BEAM_WIDTH) -> DataFrame:
    """(doc_id, text) -> (doc_id, decoded_beam, decoded_greedy,
    n_frames, beam_beats_greedy). Narrow mapInPandas — document-local
    state, zero shuffle, same scale shape as extraction."""
    from ..kernels.ctcbeam import ctc_beam_decode, ctc_greedy_decode

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                mat = lattice_from_text(text)
                beam, _p = ctc_beam_decode(mat, beam_width)
                greedy = ctc_greedy_decode(mat)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "decoded_beam": "".join(CLASSES[c] for c in beam),
                        "decoded_greedy": "".join(CLASSES[c] for c in greedy),
                        "n_frames": mat.shape[0],
                        "beam_beats_greedy": beam != greedy,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "decoded_beam", "decoded_greedy",
                    "n_frames", "beam_beats_greedy",
                ],
            )

    return docs.select("doc_id", "text").mapInPandas(
        decode,
        schema=(
            "doc_id long, decoded_beam string, decoded_greedy string, "
            "n_frames int, beam_beats_greedy boolean"
        ),
    )


@query("ctc_beam_decode")
def ctc_beam_decode_q(spark, sf_dir):
    """Rows-only driver entry (no SQL twin for sequential beam state);
    exact-vs-exhaustive and determinism are pytest-gated."""
    return ctc_decode_documents(load(spark, sf_dir, "documents"))
