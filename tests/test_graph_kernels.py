"""Property tests for the in-UDF graph kernels (SURVEY O6 / U4).

These have no DuckDB oracle (rows-only driver check), so correctness is
pinned here: MST minimality + spanning invariants against a brute-force
Prim, and DBSCAN label invariance under row permutation.
"""

import numpy as np
import pandas as pd
import pytest

from win64_local_ocr_tool_spark.operators.relational3 import (
    _dbscan_members,
    _mst_edges,
)


def _group(sf_dir, label):
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return pdf[pdf["label"] == label].copy()


def _prim_total(pdf):
    X = np.asarray(list(pdf.sort_values("vec_id")["embedding"]), dtype=np.float64)
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0.0] = 1.0
    sims = (X @ X.T) / np.outer(norms, norms)
    dist = np.rint((1.0 - sims) * 1_000_000).astype(np.int64)
    n = len(X)
    in_tree = np.zeros(n, dtype=bool)
    in_tree[0] = True
    best = dist[0].copy()
    total = 0
    for _ in range(n - 1):
        best[in_tree] = np.iinfo(np.int64).max
        j = int(np.argmin(best))
        total += int(best[j])
        in_tree[j] = True
        best = np.minimum(best, dist[j])
    return total


@pytest.mark.parametrize("label", [0, 3, 7])
def test_mst_spans_and_is_minimal(sf_dir, label):
    g = _group(sf_dir, label)
    edges = _mst_edges(g)
    n = len(g)
    assert len(edges) == n - 1
    # spanning: union-find over emitted edges connects everything
    ids = {v: i for i, v in enumerate(sorted(g["vec_id"]))}
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for s, d in zip(edges["src"], edges["dst"]):
        parent[find(ids[s])] = find(ids[d])
    assert len({find(i) for i in range(n)}) == 1
    # minimal: total weight equals an independent Prim implementation
    assert int(edges["w_micro"].sum()) == _prim_total(g)


def test_mst_invariant_under_row_order(sf_dir):
    g = _group(sf_dir, 2)
    shuffled = g.sample(frac=1.0, random_state=7)
    a = _mst_edges(g).sort_values(["src", "dst"]).reset_index(drop=True)
    b = _mst_edges(shuffled).sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_dbscan_invariant_under_row_order(sf_dir):
    g = _group(sf_dir, 5)
    a = _dbscan_members(g).sort_values("vec_id").reset_index(drop=True)
    b = (
        _dbscan_members(g.sample(frac=1.0, random_state=3))
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # canonical labels: every non-noise cluster id is its min member id
    non_noise = a[a["cluster"] >= 0]
    for cid, grp in non_noise.groupby("cluster"):
        assert cid == grp["vec_id"].min()


def test_dbscan_core_semantics(sf_dir):
    """Every non-noise cluster has >= minPts members reachable within
    eps of some core point; noise points have < minPts neighbors."""
    g = _group(sf_dir, 5)
    out = _dbscan_members(g)
    sizes = out[out["cluster"] >= 0].groupby("cluster").size()
    assert (sizes >= 3).all()


def test_spark_kernels_match_local(spark, sf_dir):
    """The distributed applyInPandas result equals the per-group local
    kernel run — partitioning does not change the answer."""
    from win64_local_ocr_tool_spark.operators.registry import QUERIES

    got = (
        QUERIES["o6_mst_kruskal"](spark, sf_dir)
        .toPandas()
        .sort_values(["component", "src", "dst"])
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    want = (
        pd.concat([_mst_edges(g) for _, g in pdf.groupby("label")])
        .sort_values(["component", "src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype(want.dtypes.to_dict()), want
    )
