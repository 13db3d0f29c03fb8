"""CTC prefix beam search: exactness vs the brute-force all-paths
oracle, the classic beam-beats-greedy case, and Spark-side
determinism."""

import numpy as np
import pytest

from win64_local_ocr_tool_spark.kernels.ctcbeam import (
    ctc_beam_decode,
    ctc_exhaustive_decode,
    ctc_greedy_decode,
)


@pytest.mark.parametrize("seed", range(12))
def test_unpruned_beam_equals_exhaustive(seed):
    """With beam_width >= live prefixes the prefix recursion is exact:
    top labeling and its total probability must match the brute-force
    sum over all C^T alignment paths."""
    rng = np.random.default_rng(seed)
    T, C = 5, 4
    mat = rng.random((T, C)) + 0.02
    mat /= mat.sum(axis=1, keepdims=True)
    want_lab, want_p = ctc_exhaustive_decode(mat)
    got_lab, got_p = ctc_beam_decode(mat, beam_width=10_000)
    assert got_lab == want_lab
    assert got_p == pytest.approx(want_p, rel=1e-12)


def test_beam_beats_greedy_on_the_classic_lattice():
    """The textbook CTC case: per-frame argmax is blank both frames
    (P=0.36) but the summed mass of 'a' across its three alignments
    (a-, -a, aa) is 0.64 — beam must return 'a', greedy returns ''."""
    mat = np.array([[0.6, 0.4], [0.6, 0.4]])
    assert ctc_greedy_decode(mat) == ()
    lab, p = ctc_beam_decode(mat, beam_width=4)
    assert lab == (1,)
    assert p == pytest.approx(0.64)


def test_repeat_rule_requires_blank():
    """'aa' is only reachable through a blank between the runs: a
    lattice with overwhelming 'a' mass every frame must decode to 'a',
    not 'aa'."""
    mat = np.array([[0.01, 0.99]] * 4)
    lab, _ = ctc_beam_decode(mat, beam_width=8)
    assert lab == (1,)


def test_pruned_beam_is_deterministic_and_valid():
    rng = np.random.default_rng(99)
    mat = rng.random((12, 5)) + 0.02
    mat /= mat.sum(axis=1, keepdims=True)
    a = ctc_beam_decode(mat, beam_width=3)
    b = ctc_beam_decode(mat, beam_width=3)
    assert a == b
    # widening the beam can only improve (or keep) the found probability
    _, p3 = a
    _, p50 = ctc_beam_decode(mat, beam_width=50)
    assert p50 >= p3 - 1e-15


def test_spark_decode_partitioning_invariant(spark, sf_dir):
    from win64_local_ocr_tool_spark.operators.ctc import ctc_decode_documents
    from win64_local_ocr_tool_spark.operators.tables import load

    docs = load(spark, sf_dir, "documents").limit(120)
    a = ctc_decode_documents(docs).toPandas().sort_values("doc_id")
    b = (
        ctc_decode_documents(docs.repartition(13))
        .toPandas()
        .sort_values("doc_id")
    )
    assert list(a["decoded_beam"]) == list(b["decoded_beam"])
    assert list(a["decoded_greedy"]) == list(b["decoded_greedy"])
    # the lattice family genuinely exercises the beam-vs-greedy gap
    assert a["beam_beats_greedy"].any()
