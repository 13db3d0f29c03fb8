"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's only long-lived state is the Averager loss tracker
(``recognition/utils.py:147-167``, SURVEY A8) — a running (sum, count)
pair carried across batches. This module is its streaming restatement
at engine scale: per-key running totals maintained in Spark's state
store, surviving query restarts through the checkpoint, updated one
Arrow batch at a time.

Design rules carried over from the batch engine:

- **No floats in state.** The running total is kept in scaled integer
  cents; float accumulation order varies across batch boundaries and
  would make state depend on arrival schedule (same reasoning as the
  a8_running_average oracle query).
- **State is per-key and tiny** (two longs), so the state store scales
  with distinct keys, not events — the only thing that matters at
  10^12-event scale.
- **Batch twin:** a plain groupBy aggregate over the same input must
  equal the final emitted totals (pytest-gated) — streaming adds
  incrementality, never different answers.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)

OUTPUT_SCHEMA = "user_id long, n_events long, total_cents long"
STATE_SCHEMA = "n long, total_cents long"


def _update_totals(
    key: Tuple[int],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    n, total = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        # scaled-integer arithmetic: order-independent, restart-stable.
        # HALF_UP rounding to match the batch twin (Spark F.round) —
        # pandas .round() is half-to-even and diverges on exact halves.
        v = pdf["value"].to_numpy() * 100.0
        cents = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))
        total += int(cents.astype("int64").sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_cents": [total]}
    )


def running_user_totals(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming per-user running (count, total) over event files.

    Returns the unstarted streaming DataFrame; each processed batch
    emits one row per touched user with the running totals INCLUDING
    all previous batches (state store + checkpoint carry them across
    restarts)."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain_running_totals(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain available files through the stateful operator, writing each
    batch's update rows to an ``epoch=<id>`` directory (the memory sink
    cannot recover from a checkpoint; overwrite-by-epoch parquet can —
    same idempotent-replay scheme as ``incremental_extraction``)."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        batch.withColumn("epoch", F.lit(int(epoch_id))).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/epoch={epoch_id}")

    q = (
        running_user_totals(spark, input_dir)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def latest_totals(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per user, the most recent running-total row across all epochs."""
    from pyspark.sql import functions as F

    rows = spark.read.schema(OUTPUT_SCHEMA + ", epoch long").option(
        "recursiveFileLookup", "true"
    ).parquet(out_dir)
    latest = F.max_by(
        F.struct("n_events", "total_cents"), F.col("epoch")
    ).alias("s")
    return rows.groupBy("user_id").agg(latest).select(
        "user_id", "s.n_events", "s.total_cents"
    )
