"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction end-to-end; ``queries()``
exposes every implemented operator from SURVEY.md §2 (plus the
training-data ops) as (spark, sf_dir) -> DataFrame; ``oracle_sql()``
gives the DuckDB-equivalent SQL for each SQL-expressible one.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing the operator modules populates the registry.
from win64_local_ocr_tool_spark.operators import (  # noqa: F401,E402
    multimodal,
    relational,
    relational2,
    relational3,
    similarity,
    textops,
)
from win64_local_ocr_tool_spark.operators.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full extraction pipeline over the deterministic
    synthetic corpus (north-rule input shape: url, warc_ts, html binary,
    text, lang — synthesized in-Spark, no external data), both physical
    paths exercised. Returns the extracted table."""
    from win64_local_ocr_tool_spark.corpus import corpus_df
    from win64_local_ocr_tool_spark.pipeline import run_extraction

    docs = corpus_df(spark, 1100)  # covers normal/PDF/corrupt/mega rows
    return run_extraction(spark, docs)["extracted"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
