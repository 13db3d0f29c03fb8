#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark AND its
``oracle_sql()`` on DuckDB (same parquet, pre-registered views), then
compares row count, sorted column names, and the order-insensitive
multiset of canonicalized values. Strictly stricter than a value-hash:
any mismatch prints the offending rows.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
       python scripts/check_oracle.py --all [sf_dir] [query ...]

``--all`` sweeps the INTERNAL registry (every component query,
including ones folded out of the driver export) instead of the
exported set.
"""

from __future__ import annotations

import datetime
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_args = sys.argv[1:]
ALL = "--all" in _args
_args = [a for a in _args if a != "--all"]
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = set(_args[1:])

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    import numpy as np

    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return round(f, 9)
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, (datetime.datetime,)):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v
    return str(v)


def canon_rows(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(canon(r[c]) for c in cols) for _, r in pdf[cols].iterrows()]
    return cols, sorted(rows, key=repr)


def dtype_tags(pdf):
    """Materialized-dtype tag per (sorted) column — the typed half of the
    driver gate. The round-1 lesson: five queries had identical VALUES
    but hash-failed because an uncast integer sum() reached DuckDB as
    HUGEINT, which lands in pandas as float64 where Spark's BIGINT lands
    as int64 — a value-canonicalizing compare can't see that, a dtype
    compare can. Int widths collapse to one tag (both engines print ints
    identically) and datetime units are unified; int-vs-float is exactly
    the mismatch class this must catch."""
    tags = {}
    for c in sorted(pdf.columns):
        k = pdf[c].dtype.kind  # i/u int, f float, O object, M datetime, b bool
        tags[c] = {"i": "int", "u": "int", "f": "float", "M": "datetime",
                   "b": "bool"}.get(k, "obj")
    return tags


def main() -> int:
    import __spark_entry__ as entry
    from win64_local_ocr_tool_spark.session import get_spark

    spark = get_spark("check_oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    if ALL:
        from win64_local_ocr_tool_spark.operators.registry import (
            ORACLES as oracles,
            QUERIES as queries,
        )
    else:
        queries = entry.queries()
        oracles = entry.oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"ROWS {name}: {len(got)} rows (no oracle)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        gc, gr = canon_rows(got)
        wc, wr = canon_rows(want)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}")
            failed.append(name)
            continue
        gt, wt = dtype_tags(got), dtype_tags(want)
        if gt != wt:
            bad = {c: (gt[c], wt[c]) for c in gt if gt[c] != wt[c]}
            print(f"FAIL {name}: dtype mismatch (spark, duck) = {bad}")
            failed.append(name)
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} vs {len(wr)}")
            failed.append(name)
            continue
        diffs = [(a, b) for a, b in zip(gr, wr) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)} row mismatches; first 3:")
            for a, b in diffs[:3]:
                print("   spark:", a)
                print("   duck :", b)
            failed.append(name)
            continue
        passed.append(name)
        print(f"PASS {name}: {len(gr)} rows, cols={gc}")

    print(
        f"\n== {len(passed)} passed, {len(failed)} failed, "
        f"{len(rows_only)} rows-only =="
    )
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
