"""Third tranche of SURVEY.md §2 operators: the remaining filter /
aggregate / sort / set-op rows (F2, F3, F6, F8, A1, O1, O3) plus the two
in-UDF graph kernels (O6 Kruskal MST, U4 DBSCAN) that have no SQL twin.

Every oracle follows the registry column-name discipline; the two
rows-only kernels are pure-numpy (no scipy/sklearn in this runtime),
deterministic under row permutation and partitioning, and property-
tested in tests/test_graph_kernels.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .registry import query
from .tables import load


@query(
    "f2_binarize_mask",
    """
    SELECT event_id, CAST(value > 50.0 AS INTEGER) AS is_dense
    FROM events
    """,
)
def f2_binarize_mask(spark, sf_dir):
    """Binarize predicate -> boolean mask column (reference: threshold
    100/255 over the score plane, segment_from_point_clusters.py:13-14;
    SURVEY F2). The mask stays a column — F1 is the variant that also
    filters."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id", (F.col("value") > 50.0).cast("int").alias("is_dense")
    )


@query(
    "f3_null_label_filter",
    """
    SELECT kept_label, count(*) AS n
    FROM (SELECT NULLIF(l_returnflag, 'N') AS kept_label FROM lineitem)
    WHERE kept_label IS NOT NULL
    GROUP BY kept_label
    """,
)
def f3_null_label_filter(spark, sf_dir):
    """Null-label drop (reference: points labeled None are filtered at
    read, segment_from_point_clusters.py:38-42; SURVEY F3): nullify the
    majority class, keep only labeled rows."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(F.nullif(F.col("l_returnflag"), F.lit("N")).alias("kept_label"))
        .filter(F.col("kept_label").isNotNull())
        .groupBy("kept_label")
        .agg(F.count("*").alias("n"))
    )


@query(
    "f6_projection_prune",
    """
    SELECT p_partkey, p_size FROM part WHERE p_size >= 30
    """,
)
def f6_projection_prune(spark, sf_dir):
    """Column projection (reference: keep one channel / cols 0:2,
    segment_from_point_clusters.py:351-354; SURVEY F6). The point at
    scale: Catalyst prunes the scan to ReadSchema(p_partkey, p_size) and
    pushes p_size >= 30 into the parquet reader — a wide table costs
    only the two columns read (gated in tests/test_plans.py)."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 30)
        .select("p_partkey", "p_size")
    )


@query(
    "f8_outlier_mask",
    """
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type
    ),
    r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rn
      FROM c
    )
    SELECT e.event_id, e.user_id, e.event_type
    FROM events e
    JOIN r ON e.user_id = r.user_id AND e.event_type = r.event_type
    WHERE r.rn = 1
    """,
)
def f8_outlier_mask(spark, sf_dir):
    """Majority-cluster outlier mask (reference: drop edges whose DBSCAN
    label is -1 / keep only the majority cluster,
    LayoutGraphGenerator.js:296-323; SURVEY F8 + A6): rows outside their
    group's majority class are the outliers and are dropped. Ties on the
    count break on the class name — row_number, never bare arg_max, so
    both engines pick the same winner. The majority table is tiny (one
    row per user) -> broadcast-joined back; no second shuffle of the
    fact side at scale."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = W.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    majority = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type")
    )
    return ev.join(F.broadcast(majority), ["user_id", "event_type"]).select(
        "event_id", "user_id", "event_type"
    )


@query(
    "a1_component_avg",
    """
    SELECT label AS component, count(*) AS n,
           round(avg(CAST(vec_id AS DOUBLE)), 4) AS avg_id
    FROM embeddings GROUP BY label
    """,
)
def a1_component_avg(spark, sf_dir):
    """Per-component mean position (reference: mean y per connected
    component orders the lines, segment_graph.py:291-295; SURVEY A1).
    Averaging an integer column keeps the sum exact, so the rounded
    mean is identical math on both engines."""
    e = load(spark, sf_dir, "embeddings")
    return e.groupBy(F.col("label").alias("component")).agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.col("vec_id").cast("double")), 4).alias("avg_id"),
    )


@query(
    "o1_lexicographic_rank",
    """
    SELECT doc_id, source,
           row_number() OVER (ORDER BY source, doc_id) AS pos
    FROM documents WHERE doc_id < 200
    """,
)
def o1_lexicographic_rank(spark, sf_dir):
    """Deterministic lexicographic ordering with materialized position
    (reference: sorted dir listing fixes page order,
    segmentation/utils.py:21; SURVEY O1). The single-partition global
    window is deliberate and bounded (doc_id < 200) — at corpus scale a
    global ordinal is a range-partitioned sort (orderBy writes
    range-partitioned output; per-document ids never need it)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    w = W.orderBy("source", "doc_id")
    return d.select("doc_id", "source", F.row_number().over(w).alias("pos"))


@query(
    "o3_sorted_array",
    """
    SELECT user_id,
           array_to_string(list_sort(list(event_id)), ',') AS ordered_ids
    FROM events GROUP BY user_id
    """,
)
def o3_sorted_array(spark, sf_dir):
    """Sort collected array contents (reference: sort line centers by x
    for reading order, segment_from_point_clusters.py:134; SURVEY O3).
    array_sort runs after collect_list so the result is independent of
    partition arrival order; serialized to one string column because the
    driver hashes scalar values."""
    ev = load(spark, sf_dir, "events")
    arr = F.array_sort(F.collect_list("event_id"))
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(arr, lambda x: x.cast("string")), ","
        ).alias("ordered_ids")
    )


@query(
    "c7_math_functions",
    """
    SELECT event_id,
           round(CAST(value AS DOUBLE) /
                 sqrt(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                      + CAST(user_id + 1 AS DOUBLE)
                        * CAST(user_id + 1 AS DOUBLE)), 6) AS direction,
           round(sqrt(CAST(value AS DOUBLE)), 6) AS magnitude,
           to_base64(CAST(event_type AS BLOB)) AS b64
    FROM events
    """,
)
def c7_math_functions(spark, sf_dir):
    """Math + encoding scalar kernels (reference: atan2/cos-sim/norms in
    edge-feature construction, LayoutGraphGenerator.js:224-261, SURVEY
    C7; base64 page serving, routes.py:116-119, SURVEY C10).

    Float discipline (CLAUDE.md): every compared double column is
    composed ONLY of IEEE correctly-rounded ops (*, +, /, sqrt), which
    are bit-identical across engines, so the 6-decimal round is safe.
    atan2 is deliberately NOT in the compared output — libm
    implementations differ by ulps (it lives in the in-UDF kernels
    where only one implementation runs, e.g. the MST/DBSCAN numpy
    paths). ``direction`` is the cosine of the same angle: the actual
    edge-feature math of the reference, correctly-rounded throughout."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    u = (F.col("user_id") + 1).cast("double")
    return ev.select(
        "event_id",
        F.round(v / F.sqrt(v * v + u * u), 6).alias("direction"),
        F.round(F.sqrt(v), 6).alias("magnitude"),
        F.base64(F.col("event_type").cast("binary")).alias("b64"),
    )


@query(
    "c12_json_serialize",
    """
    SELECT doc_id,
           to_json(struct_pack(doc_id := doc_id, lang := lang,
                               n_chars := n_chars)) AS doc_json
    FROM documents WHERE doc_id < 100
    """,
)
def c12_json_serialize(spark, sf_dir):
    """Struct -> JSON serialization (reference: graph persisted as a
    JSON twin of the tensor form, segment_graph.py:174-188; SURVEY
    C12)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "lang", "n_chars")).alias("doc_json"),
    )


def _mst_edges(pdf: pd.DataFrame) -> pd.DataFrame:
    """Kruskal MST over one component's complete cosine-distance graph.

    Pure numpy + union-find; weights are integer micro-units so the
    edge sort (w, src, dst) is exact — no float-tie nondeterminism."""
    import numpy as np

    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy()
    X = np.asarray(list(pdf["embedding"]), dtype=np.float64)
    n = len(ids)
    if n < 2:
        return pd.DataFrame(
            {"component": pdf["label"][:0], "src": ids[:0], "dst": ids[:0],
             "w_micro": np.array([], dtype=np.int64)}
        )
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0.0] = 1.0
    sims = (X @ X.T) / np.outer(norms, norms)
    dist = np.rint((1.0 - sims) * 1_000_000).astype(np.int64)
    iu, ju = np.triu_indices(n, k=1)
    order = np.lexsort((ju, iu, dist[iu, ju]))
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    src, dst, wts = [], [], []
    for k in order:
        a, b = int(iu[k]), int(ju[k])
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            src.append(ids[a])
            dst.append(ids[b])
            wts.append(int(dist[a, b]))
            if len(src) == n - 1:
                break
    return pd.DataFrame(
        {
            "component": [int(pdf["label"].iloc[0])] * len(src),
            "src": src,
            "dst": dst,
            "w_micro": wts,
        }
    )


_MST_SQL = """
    WITH RECURSIVE norms AS (
      SELECT label AS component, vec_id,
             CAST(embedding AS DOUBLE[]) AS v,
             CASE WHEN sqrt(list_dot_product(
                      CAST(embedding AS DOUBLE[]),
                      CAST(embedding AS DOUBLE[]))) = 0.0 THEN 1.0
                  ELSE sqrt(list_dot_product(
                      CAST(embedding AS DOUBLE[]),
                      CAST(embedding AS DOUBLE[]))) END AS nrm
      FROM embeddings
    ),
    ranked AS (  -- complete graph, integer micro-unit cosine distance,
                 -- total order (w, src, dst) == the kernel's lexsort
      SELECT component, src, dst, w_micro,
             CAST(row_number() OVER (
               PARTITION BY component ORDER BY w_micro, src, dst
             ) AS BIGINT) AS rk
      FROM (
        SELECT a.component, a.vec_id AS src, b.vec_id AS dst,
               CAST(round_even(
                 (1.0 - list_dot_product(a.v, b.v) / (a.nrm * b.nrm))
                 * 1000000.0, 0) AS BIGINT) AS w_micro
        FROM norms a
        JOIN norms b
          ON a.component = b.component AND a.vec_id < b.vec_id
      )
    ),
    -- Kruskal restated as selection-driven iteration: each step finds
    -- the minimum-rank edge whose endpoints sit in different
    -- components (mrk), merges the two labels to their least, and
    -- marks that edge selected.  Edge rows of a finished component
    -- (mrk IS NULL) drop out, terminating the recursion after exactly
    -- n-1 merges per component.
    state(component, it, src, dst, w_micro, rk, csrc, cdst, sel) AS (
      SELECT component, 0, src, dst, w_micro, rk, src, dst, FALSE
      FROM ranked
      UNION ALL
      SELECT component, it + 1, src, dst, w_micro, rk,
             CASE WHEN csrc IN (e1, e2) THEN least(e1, e2)
                  ELSE csrc END,
             CASE WHEN cdst IN (e1, e2) THEN least(e1, e2)
                  ELSE cdst END,
             rk = mrk
      FROM (
        SELECT s2.*,
               MAX(CASE WHEN rk = mrk THEN csrc END)
                 OVER (PARTITION BY component) AS e1,
               MAX(CASE WHEN rk = mrk THEN cdst END)
                 OVER (PARTITION BY component) AS e2
        FROM (
          SELECT s.*,
                 MIN(CASE WHEN csrc <> cdst THEN rk END)
                   OVER (PARTITION BY component) AS mrk
          FROM state s
        ) s2
        WHERE mrk IS NOT NULL
      )
    )
    SELECT component, src, dst, w_micro FROM state WHERE sel
    """


@query("o6_mst_kruskal", _MST_SQL)
def o6_mst_kruskal(spark, sf_dir):
    """Kruskal minimum-spanning-tree per component (reference: hover-MST
    connect with Kruskal + disjoint-set union,
    new-SemiSegmentationSection.vue:573-657; SURVEY O6). Graphs never
    cross a component, so the whole kernel lives in one applyInPandas
    group — one shuffle on the grouping key, no iterative joins, no
    GraphFrames. Edge weights are integer micronits of cosine distance;
    the (w, src, dst) lexsort makes the tree unique, so the DuckDB twin
    can restate union-find as a recursive CTE: rank all edges by
    (w_micro, src, dst), then iterate "merge the least-ranked
    cross-component edge" until fixpoint — identical tree by the cut
    property.  round_even matches np.rint (half-to-even); the weight is
    the same IEEE double expression on both engines before the single
    integer rounding, so micro-unit parity holds (see u4 precedent).
    Minimality and edge-count invariants are additionally pytest-gated
    (test_graph_ops.py)."""
    e = load(spark, sf_dir, "embeddings")
    return e.groupBy("label").applyInPandas(
        _mst_edges,
        schema="component int, src long, dst long, w_micro long",
    )


def _dbscan_members(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pure-numpy DBSCAN over one group's 2-D feature points.

    eps/minPts closure via boolean matrix BFS; cluster ids are
    renumbered by each cluster's minimum vec_id so the labeling is
    invariant to row order and partitioning. Noise = -1."""
    import numpy as np

    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy()
    X = np.asarray(list(pdf["embedding"]), dtype=np.float64)[:, :2] * 10.0
    n = len(ids)
    eps, min_pts = 4.0, 3
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    nbr = d2 <= eps * eps
    core = nbr.sum(axis=1) >= min_pts
    cluster = np.full(n, -1, dtype=np.int64)
    cid = 0
    for i in range(n):
        if cluster[i] != -1 or not core[i]:
            continue
        frontier = {i}
        members = set()
        while frontier:
            j = frontier.pop()
            if j in members:
                continue
            members.add(j)
            if core[j]:
                frontier |= set(np.flatnonzero(nbr[j])) - members
        for j in members:
            cluster[j] = cid
        cid += 1
    remap = {}
    for c in range(cid):
        remap[c] = int(ids[np.flatnonzero(cluster == c)].min())
    out = np.array([remap[c] if c >= 0 else -1 for c in cluster], dtype=np.int64)
    return pd.DataFrame(
        {"component": pdf["label"], "vec_id": ids, "cluster": out}
    )


_DBSCAN_SQL = """
    WITH RECURSIVE pts AS (
      SELECT label AS component, vec_id,
             CAST(embedding[1] AS DOUBLE) * 10.0 AS x,
             CAST(embedding[2] AS DOUBLE) * 10.0 AS y
      FROM embeddings
    ),
    adj AS (  -- eps-adjacency incl. self (d2 = 0 <= eps^2)
      SELECT a.component, a.vec_id AS i, b.vec_id AS j
      FROM pts a JOIN pts b USING (component)
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 16.0
    ),
    core AS (  -- self counts toward minPts, matching the kernel
      SELECT component, i AS vec_id
      FROM adj GROUP BY component, i HAVING count(*) >= 3
    ),
    cedge AS (  -- core-core adjacency (symmetric, incl. self-loops)
      SELECT adj.component, adj.i, adj.j
      FROM adj
      JOIN core ca ON ca.component = adj.component AND ca.vec_id = adj.i
      JOIN core cb ON cb.component = adj.component AND cb.vec_id = adj.j
    ),
    reach(component, a, b) AS (
      SELECT component, i, j FROM cedge
      UNION
      SELECT r.component, r.a, e.j
      FROM reach r JOIN cedge e
        ON r.component = e.component AND r.b = e.i
    ),
    ccore AS (  -- core's cluster = min core id of its core-CC
      SELECT component, a AS vec_id, min(b) AS clabel
      FROM reach GROUP BY component, a
    ),
    assigned AS (
      -- cores take their CC label; a border takes the LAST seeded
      -- cluster that reaches it (the kernel's ascending-seed BFS
      -- overwrites, so last = MAX CC label among adjacent cores)
      SELECT p.component, p.vec_id,
             coalesce(cc.clabel, bmax.clabel) AS cluster0
      FROM pts p
      LEFT JOIN ccore cc
        ON cc.component = p.component AND cc.vec_id = p.vec_id
      LEFT JOIN (
        SELECT adj.component, adj.i AS vec_id, max(cx.clabel) AS clabel
        FROM adj JOIN ccore cx
          ON cx.component = adj.component AND cx.vec_id = adj.j
        GROUP BY adj.component, adj.i
      ) bmax ON bmax.component = p.component AND bmax.vec_id = p.vec_id
    ),
    remap AS (  -- canonical id = min member vec_id of the FINAL cluster
      SELECT component, cluster0, min(vec_id) AS final_label
      FROM assigned WHERE cluster0 IS NOT NULL
      GROUP BY component, cluster0
    )
    SELECT a.component, a.vec_id,
           coalesce(r.final_label, CAST(-1 AS BIGINT)) AS cluster
    FROM assigned a LEFT JOIN remap r USING (component, cluster0)
    """


@query("u4_dbscan_closure", _DBSCAN_SQL)
def u4_dbscan_closure(spark, sf_dir):
    """DBSCAN density-reachable closure per group (reference:
    neighbor-set union closure inside DBSCAN,
    LayoutGraphGenerator.js:162-170; SURVEY U4 — f8_outlier_mask is the
    downstream relational consumer of these labels). Document-local like
    every graph op here, so it is one applyInPandas group; cluster ids
    are canonicalized to the minimum member vec_id, making output
    independent of partition count (pytest-gated).

    Round-2 upgrade: the closure IS oracle-able — the DuckDB twin
    restates the BFS as eps-adjacency -> core set -> recursive
    core-core transitive closure -> border attachment with the
    kernel's exact last-writer-wins semantics (ascending-seed BFS
    overwrite == max CC label among a border's adjacent cores) ->
    min-member renumbering. Distance math is the identical IEEE
    float64 expression on both engines, so the eps boundary set
    matches exactly."""
    e = load(spark, sf_dir, "embeddings")
    return e.groupBy("label").applyInPandas(
        _dbscan_members, schema="component int, vec_id long, cluster long"
    )
