"""CTC prefix beam-search decoder (from scratch, pure numpy/stdlib).

The one reference compute kernel that had no analog here: CTC beam
search over a per-frame class-probability lattice (reference
``backend/annotator/finetune/utils.py:74-166`` — the Hwang/Graves
prefix search; its greedy collapse twin is ``recognition/utils.py:39-50``
and lives relationally in ``c2_collapse_runs``).

Semantics (WHAT the reference computes, restated):

- Each prefix (labeling with blanks/repeats removed) carries two path
  masses: ``pr_blank`` (paths ending in blank) and ``pr_nonblank``
  (paths ending in the prefix's last symbol). Per frame every kept
  prefix extends: stay via blank, repeat the last symbol (mass stays
  in the same prefix), or append a new symbol — appending the SAME
  symbol again is only reachable through a blank (the CTC repeat
  rule).
- Beam pruning keeps the top ``beam_width`` prefixes by total mass,
  ties broken lexicographically (deterministic under any iteration
  order — the reference's dict ordering is insertion-dependent; this
  implementation pins it).
- With ``beam_width`` >= the number of live prefixes the recursion is
  EXACT — pytest verifies equality against a brute-force sum over all
  C^T alignment paths on small lattices.

Deliberate divergence from the reference: its extension loop runs
``range(maxC - 1)`` with ``blankIdx = 0`` — i.e. it extends prefixes
with the blank class and never with the LAST class, an off-by-one for
its own blank=0 convention. This implementation extends over the
corrected non-blank range ``range(1, C)``; exactness is verified
against the brute-force all-paths oracle, which the reference's
indexing would fail.

Blank index 0, matching the reference. Sequential per-document state
keeps this an in-UDF kernel (SURVEY §2.10): document-local, no
relational twin — the driver entry is rows-only by contract.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

BLANK = 0


def ctc_beam_decode(
    mat: np.ndarray, beam_width: int = 8
) -> tuple[tuple[int, ...], float]:
    """(best labeling, its total probability) for a T x C lattice.

    ``mat[t, c]`` = probability of class c at frame t (col 0 = blank).
    """
    mat = np.asarray(mat, dtype=np.float64)
    T, C = mat.shape
    # prefix -> [pr_blank, pr_nonblank]
    beams: dict[tuple[int, ...], list[float]] = {(): [1.0, 0.0]}
    for t in range(T):
        frame = mat[t]
        best = sorted(
            beams.items(), key=lambda kv: (-(kv[1][0] + kv[1][1]), kv[0])
        )[:beam_width]
        new: dict[tuple[int, ...], list[float]] = defaultdict(
            lambda: [0.0, 0.0]
        )
        for prefix, (pb, pnb) in best:
            total = pb + pnb
            # 1) emit blank: prefix unchanged, mass moves to pr_blank
            new[prefix][0] += total * frame[BLANK]
            # 2) repeat the last symbol: prefix unchanged (CTC collapse)
            if prefix:
                new[prefix][1] += pnb * frame[prefix[-1]]
            # 3) append symbol c
            for c in range(1, C):
                ext = prefix + (c,)
                if prefix and prefix[-1] == c:
                    # same symbol again is only reachable via blank
                    new[ext][1] += pb * frame[c]
                else:
                    new[ext][1] += total * frame[c]
        beams = {k: v for k, v in new.items()}
    best_prefix, masses = min(
        beams.items(), key=lambda kv: (-(kv[1][0] + kv[1][1]), kv[0])
    )
    return best_prefix, masses[0] + masses[1]


def ctc_greedy_decode(mat: np.ndarray) -> tuple[int, ...]:
    """Best-path decode: per-frame argmax, collapse repeats, drop
    blanks (the reference's fast path; relational twin
    ``c2_collapse_runs``)."""
    path = np.asarray(mat, dtype=np.float64).argmax(axis=1)
    out: list[int] = []
    prev = -1
    for c in path:
        if c != prev and c != BLANK:
            out.append(int(c))
        prev = int(c)
    return tuple(out)


def ctc_exhaustive_decode(mat: np.ndarray) -> tuple[tuple[int, ...], float]:
    """Brute-force oracle: sum path probability over ALL C^T alignment
    paths per collapsed labeling (tests only — exponential)."""
    from itertools import product

    mat = np.asarray(mat, dtype=np.float64)
    T, C = mat.shape
    scores: dict[tuple[int, ...], float] = defaultdict(float)
    for path in product(range(C), repeat=T):
        p = 1.0
        for t, c in enumerate(path):
            p *= mat[t, c]
        lab: list[int] = []
        prev = -1
        for c in path:
            if c != prev and c != BLANK:
                lab.append(c)
            prev = c
        scores[tuple(lab)] += p
    return min(scores.items(), key=lambda kv: (-kv[1], kv[0]))
