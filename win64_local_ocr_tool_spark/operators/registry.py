"""Query/oracle registry backing the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible) a
DuckDB oracle SQL string. ``__spark_entry__.py`` re-exports the dicts.

Column-name discipline (driver compare): every computed column is
aliased identically in the Spark plan and the oracle SQL; doubles that
aggregate floating sums are rounded on BOTH sides so the value-hash is
stable across summation orders.
"""

from __future__ import annotations

from typing import Callable

QUERIES: dict[str, Callable] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` -> rows-only driver check."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
