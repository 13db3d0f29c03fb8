"""Second tranche of SURVEY.md §2 operators: frames, profiles, running
aggregates, positional zip joins, deterministic splits, JSON access."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .registry import query
from .tables import load


@query(
    "w7_sliding_frame",
    """
    SELECT event_id, user_id,
           round(avg(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4) AS ctx_avg
    FROM events
    """,
)
def w7_sliding_frame(spark, sf_dir):
    """Sliding rowsBetween frame — prev/next context features
    (SURVEY W7: the neighbor-context features of the block classifier,
    relationally)."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-1, 1)
    )
    return load(spark, sf_dir, "events").select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 4).alias("ctx_avg")
    )


@query(
    "a5_profile_sum",
    """
    SELECT date_part('hour', ts) AS hour_of_day,
           round(sum(value), 2) AS profile,
           count(*) AS n
    FROM events GROUP BY date_part('hour', ts)
    """,
)
def a5_profile_sum(spark, sf_dir):
    """Axis-sum density profile (reference: projection profile
    det.sum(axis=1), segment_old_method.py:215)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.hour("ts").alias("hour_of_day")).agg(
        F.round(F.sum("value"), 2).alias("profile"),
        F.count("*").alias("n"),
    )


@query(
    "a8_running_average",
    """
    SELECT user_id, event_id,
           sum(CAST(round(value * 100, 0) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_sum_scaled,
           count(*) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_seen
    FROM events
    """,
)
def a8_running_average(spark, sf_dir):
    """Running mean state (reference: the Averager loss tracker,
    recognition/utils.py:147-167) carried as (exact scaled sum, count):
    a float running average accumulates cross-engine ulp drift row by
    row, so the compared columns are the exact integer state — the mean
    is a reporting-time division."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    scaled = F.round(F.col("value") * 100, 0).cast("long")
    return load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.sum(scaled).over(w).alias("running_sum_scaled"),
        F.count("*").over(w).alias("n_seen"),
    )


@query(
    "j2_positional_zip",
    """
    SELECT vec_id, u.pos, round(u.val, 4) AS val FROM (
      SELECT vec_id,
             unnest(list_transform(
               generate_series(1, len(embedding)),
               i -> struct_pack(pos := i - 1,
                                val := embedding[i]::DOUBLE))) AS u
      FROM embeddings WHERE vec_id < 3
    )
    """,
)
def j2_positional_zip(spark, sf_dir):
    """Positional zip: align array elements with their index
    (reference: zip(points, labels), segment_from_point_clusters.py:38).
    posexplode == unnest WITH ORDINALITY."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 3)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "pos", F.round(F.col("v").cast("double"), 4).alias("val"))


@query(
    "f4_length_filter",
    """
    SELECT doc_id, n_chars FROM documents WHERE n_chars <= 200
    """,
)
def f4_length_filter(spark, sf_dir):
    """Max-length filter (reference: drop samples with
    len(label) > batch_max_length, dataset.py:166-169)."""
    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars") <= 200)
        .select("doc_id", "n_chars")
    )


@query(
    "u2_deterministic_split",
    """
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                THEN 'train' ELSE 'val' END AS split,
           count(*) AS n, sum(n_chars) AS chars
    FROM documents GROUP BY 1
    """,
)
def u2_deterministic_split(spark, sf_dir):
    """Train/val split (reference: random() < 0.8,
    finetune/finetune.py:87-93) made DETERMINISTIC and engine-portable:
    hash the key, threshold the hex prefix ('cd'/'100' = 80.1%). At
    scale this is also restart-stable, which random() is not."""
    d = load(spark, sf_dir, "documents")
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cd", "train"
    ).otherwise("val")
    return d.groupBy(split.alias("split")).agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("chars")
    )


@query(
    "c11_json_extract",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events WHERE event_type = 'purchase'
    """,
)
def c11_json_extract(spark, sf_dir):
    """Semi-structured access: JSON property extraction from a string
    column (SURVEY C12 json serialize, inverted)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@query(
    "o2_numeric_key_sort",
    """
    SELECT doc_id, source,
           CAST(substr(source, 4) AS INTEGER) AS src_num
    FROM documents
    ORDER BY CAST(substr(source, 4) AS INTEGER), doc_id
    LIMIT 50
    """,
)
def o2_numeric_key_sort(spark, sf_dir):
    """Numeric-aware sort of formatted string keys (reference: natsorted
    line files, dataset.py:234 — the design lesson is to sort on the
    parsed integer, never the string)."""
    d = load(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    return (
        d.select("doc_id", "source", src_num.alias("src_num"))
        .orderBy("src_num", "doc_id")
        .limit(50)
    )
