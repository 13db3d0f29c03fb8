"""Bounded within-bucket candidate-pair emission for LSH band tables.

Shared by the MinHash-LSH (textops) and SRP-LSH (similarity) routes —
the round-3 verdict's lead scale fix: a naive bucket self-join emits
B(B-1)/2 pairs for a bucket of B members, so one viral
mirror/parked-domain cluster of 10^7 near-identical pages yields
~5x10^13 candidate rows from a single (band, bkey) key. AQE skew-join
can split that partition but cannot shrink the OUTPUT cardinality.

The bounded rule (implemented identically in Spark and the DuckDB
oracle fragment, single source per engine):

- bucket occupancy <= BUCKET_PAIR_CAP: emit ALL pairs (full pairwise
  fidelity where downstream verification wants it; fan-out per key is
  bounded by the cap);
- bucket occupancy  > BUCKET_PAIR_CAP: emit STAR edges only — every
  member paired with the bucket's min-id representative (B-1 edges).

Connected components — the consumer of the MinHash pairs — are
PROVABLY unchanged: within any bucket both the star and the all-pairs
form connect all members, so per-bucket connectivity (and hence the CC
over the union across buckets) is identical to the uncapped join
(pytest-proved in tests/test_operators.py). The star is chosen over
the verdict-suggested consecutive-rank chain deliberately: a chain
turns a B-member bucket into a diameter-(B-1) path, which costs the
iterative min-label CC O(B) rounds; the star has diameter 2 and
converges in ~2 rounds. Output rows are bounded by
N * bands * (cap/2 + 1) — linear in corpus size whatever the
duplication profile.

For verification consumers (SRP near-dup pairs get an exact cosine
check), oversized buckets degrade to rep-vs-member verification only —
the honest bounded-recall trade at the pathological tail, documented
on dedup_embedding_srp; small buckets (the overwhelming majority after
exact-dedup pre-collapse) keep full pairwise fidelity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BUCKET_PAIR_CAP = 32  # all-pairs emission only in buckets up to this size


def bounded_bucket_pairs(
    bands: DataFrame, id_col: str, out_a: str, out_b: str
) -> DataFrame:
    """(out_a < out_b) candidate pairs from a (id, band, bkey) band
    table under the bounded per-bucket rule above.

    Plan shape: per-bucket occupancy + min-id representative come from
    a groupBy (map-side partial agg — a 10^7-member viral bucket's key
    combines BEFORE the shuffle) joined back on (band, bkey), a join
    AQE can skew-split; a window min would instead sink the whole
    megabucket into one unsplittable reducer partition. The annotated
    result is localCheckpoint-ed so the small-bucket self-join's two
    sides and the star branch share one materialization. The self-join
    sides are pre-filtered to occ <= cap, so no join key can fan out
    past cap rows; the star branch is a narrow filter+project with no
    join at all."""
    stats = bands.groupBy("band", "bkey").agg(
        F.count("*").alias("occ"),
        F.min(id_col).alias("rep"),
    )
    occ = bands.join(stats, ["band", "bkey"]).localCheckpoint()
    small = occ.filter(F.col("occ") <= BUCKET_PAIR_CAP)
    a = small.alias("a")
    b = small.alias("b")
    allp = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias(out_a),
        F.col(f"b.{id_col}").alias(out_b),
    )
    star = occ.filter(
        (F.col("occ") > BUCKET_PAIR_CAP) & (F.col(id_col) != F.col("rep"))
    ).select(F.col("rep").alias(out_a), F.col(id_col).alias(out_b))
    return allp.unionByName(star).distinct()


def bounded_pairs_ctes(
    bands_cte: str, id_col: str, out_a: str, out_b: str
) -> str:
    """DuckDB twin of ``bounded_bucket_pairs`` as two CTE fragments
    (``occ`` + ``bpairs``) over an existing ``bands_cte(id, band,
    bkey)``; callers SELECT DISTINCT from ``bpairs``. Composed — never
    copied — into every oracle that consumes LSH candidate pairs
    (CLAUDE.md composition rule)."""
    cap = BUCKET_PAIR_CAP
    return f"""occ AS (
      SELECT {id_col}, band, bkey,
             count(*) OVER (PARTITION BY band, bkey) AS occ,
             min({id_col}) OVER (PARTITION BY band, bkey) AS rep
      FROM {bands_cte}
    ),
    bpairs AS (
      SELECT a.{id_col} AS {out_a}, b.{id_col} AS {out_b}
      FROM occ a JOIN occ b
        ON a.band = b.band AND a.bkey = b.bkey
       AND a.{id_col} < b.{id_col}
       AND a.occ <= {cap} AND b.occ <= {cap}
      UNION ALL
      SELECT rep AS {out_a}, {id_col} AS {out_b}
      FROM occ WHERE occ > {cap} AND {id_col} <> rep
    )"""
