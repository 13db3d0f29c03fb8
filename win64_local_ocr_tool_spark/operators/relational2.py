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
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
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
           count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
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
    "c2_collapse_runs",
    """
    WITH x AS (
      SELECT user_id, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    )
    SELECT user_id, event_id, event_type
    FROM x WHERE prev IS NULL OR event_type <> prev
    """,
)
def c2_collapse_runs(spark, sf_dir):
    """Run-length collapse — the relational form of CTC greedy decoding
    (drop repeats, reference recognition/utils.py:39-50): keep a row
    only where its value differs from its predecessor."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    x = ev.withColumn("prev", F.lag("event_type").over(w))
    return x.filter(
        F.col("prev").isNull() | (F.col("event_type") != F.col("prev"))
    ).select("user_id", "event_id", "event_type")


@query(
    "j4_knn_self_join",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
               FROM embeddings WHERE vec_id < 60),
    d AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_cosine_similarity(a.e, b.e), 6) AS cos
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
    ),
    r AS (
      SELECT src, dst, cos,
             row_number() OVER (PARTITION BY src
                                ORDER BY cos DESC, dst) AS rn
      FROM d
    )
    SELECT src, dst, round(cos, 4) AS cosine, rn FROM r WHERE rn <= 3
    """,
)
def j4_knn_self_join(spark, sf_dir):
    """kNN self-join: every point joined to its k nearest neighbors
    (reference: per-point 6-NN KD-tree, LayoutGraphGenerator.js:185-191;
    SURVEY J4 + W6 — the rn <= k window filter IS the top-k-per-point
    operator). Bounded here; at scale the same shape runs per-bucket
    after an LSH/IVF partitioning (see sim_ann_ivf)."""
    from .similarity import _dot_expr, _norm_expr

    e = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 60)
        .withColumn("nrm", _norm_expr(F.col("embedding")))
    )
    a = e.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    scored = a.join(b, F.col("src") != F.col("dst")).select(
        "src",
        "dst",
        F.round(
            _dot_expr(F.col("ea"), F.col("eb"))
            / (F.col("na") * F.col("nb")),
            6,
        ).alias("cos"),
    )
    w = W.partitionBy("src").orderBy(F.col("cos").desc(), "dst")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("src", "dst", F.round("cos", 4).alias("cosine"), "rn")
    )


@query(
    "o5_min_by_reduce",
    """
    SELECT user_id,
           arg_min(event_id, CAST(round(value * 10000, 0) AS BIGINT)
                             * 10000000000 + event_id) AS cheapest_event,
           arg_max(event_id, CAST(round(value * 10000, 0) AS BIGINT)
                             * 10000000000 + event_id) AS priciest_event
    FROM events GROUP BY user_id
    """,
)
def o5_min_by_reduce(spark, sf_dir):
    """min-by / max-by reduce (reference: pick the neighbor pair
    minimizing total length, LayoutGraphGenerator.js:252-255). The BY
    key is (scaled value, id) packed into one integer: value ties ARE
    present per group, and min_by on a bare float is nondeterministic
    under ties (and neither engine takes a composite key portably)."""
    ev = load(spark, sf_dir, "events")
    key = (
        F.round(F.col("value") * 10000, 0).cast("long") * F.lit(10_000_000_000)
        + F.col("event_id")
    )
    return ev.groupBy("user_id").agg(
        F.min_by("event_id", key).alias("cheapest_event"),
        F.max_by("event_id", key).alias("priciest_event"),
    )


@query(
    "incremental_window",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
)
def incremental_window(spark, sf_dir):
    """Tumbling-window aggregation on event time — the incremental-
    ingestion shape (SURVEY §2.9: would be readStream + window +
    watermark in streaming; the engine's design is batch-with-resume,
    and the window agg itself is identical)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
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
    line files, dataset.py:234, and numeric page/line key sort,
    annotationStore.js:22-34; SURVEY O2 + O7 — the design lesson is to
    sort on the parsed integer, never the string)."""
    d = load(spark, sf_dir, "documents")
    # substring to end-of-string (2-arg form), matching the oracle's
    # substr(source, 4) — a fixed length would truncate long suffixes
    src_num = F.expr("substring(source, 4)").cast("int")
    return (
        d.select("doc_id", "source", src_num.alias("src_num"))
        .orderBy("src_num", "doc_id")
        .limit(50)
    )
