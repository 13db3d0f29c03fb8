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


def _drain(stream_df: DataFrame, out_dir: str, checkpoint_dir: str) -> None:
    """ONE idempotent-replay drain for every stateful operator here:
    each batch's update rows land in an ``epoch=<id>`` directory (the
    memory sink cannot recover from a checkpoint; overwrite-by-epoch
    parquet can — same scheme as ``incremental_extraction``). A change
    to the replay/commit layout happens once, for all drains."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        batch.withColumn("epoch", F.lit(int(epoch_id))).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/epoch={epoch_id}")

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def drain_running_totals(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain available files through the running-totals operator."""
    _drain(running_user_totals(spark, input_dir), out_dir, checkpoint_dir)


SESSION_GAP_S = 1800  # inactivity gap, matching the batch sessionize query

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, closed boolean"
)
# open-session carry state: epoch-seconds + count — three longs per key
SESSION_STATE_SCHEMA = "start_s long, last_s long, n long"


def _update_sessions(
    key: Tuple[int],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Event-time session windows as custom state: consecutive events
    <= SESSION_GAP_S apart share a session; a larger gap CLOSES the
    running session (emitted with closed=True) and opens a new one.
    The still-open tail session lives in the state store and is
    re-emitted each update with closed=False.

    Deliberately NO wall-clock timeout: in this engine a session closes
    when a later event proves the gap, never when the processing clock
    says so — a processing-time timeout would make emitted rows depend
    on arrival schedule, violating the determinism discipline every
    other operator follows (same answer for any partitioning/epoch
    split of in-order arrivals).

    Late arrivals (an epoch delivering events older than the carried
    ``last_s``): merged into the open session with start = min / end =
    max, so the state invariants (start <= end, exact n) always hold
    and a mildly-late event lands in the session it belongs to. An
    event arriving later than the gap horizon of an ALREADY-CLOSED
    session cannot reopen it — matching Spark's own watermark
    semantics; exact sessionization of arbitrarily-shuffled history is
    the batch twin's job (the engine's batch-with-resume stance)."""
    import numpy as np

    pdf = pd.concat(list(batches)).sort_values(["ts", "event_id"])
    t = (pdf["ts"].astype("int64") // 1_000_000_000).to_numpy()
    if state.exists:
        start0, last0, n0 = state.get
    else:
        start0 = last0 = None
        n0 = 0
    prev = np.concatenate(([last0 if last0 is not None else t[0]], t[:-1]))
    is_new = (t - prev) > SESSION_GAP_S
    if last0 is None:
        is_new[0] = True
    seg = np.cumsum(is_new)  # 0 = continuation of the open session
    rows = []
    last_seg = int(seg[-1])
    if last0 is not None and is_new[0]:
        # the carried open session got no continuation — this batch's
        # first event proves the gap, so it closes NOW
        rows.append((int(start0), int(last0), int(n0), True))
    for s in range(0, last_seg + 1):
        mask = seg == s
        if not mask.any():
            continue  # s == 0 with no continuation rows
        ts_seg = t[mask]
        if s == 0 and last0 is not None:
            # min/max guards: a late event older than the carried state
            # merges without ever producing end < start
            s_start = min(int(start0), int(ts_seg[0]))
            s_n = int(n0) + int(mask.sum())
            s_last = max(int(last0), int(ts_seg[-1]))
        else:
            s_start, s_n = int(ts_seg[0]), int(mask.sum())
            s_last = int(ts_seg[-1])
        closed = s != last_seg
        rows.append((s_start, s_last, s_n, closed))
        if not closed:
            state.update((s_start, s_last, s_n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(rows),
            "session_start": pd.to_datetime([r[0] for r in rows], unit="s"),
            "session_end": pd.to_datetime([r[1] for r in rows], unit="s"),
            "n_events": [r[2] for r in rows],
            "closed": [r[3] for r in rows],
        }
    )


def streaming_sessions(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming session windows per user (SURVEY §2.9: the custom
    stateful operator the brief names — ``applyInPandasWithState``
    carrying an open-session record per key)."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_sessions,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain_sessions(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain available files through the session operator."""
    _drain(streaming_sessions(spark, input_dir), out_dir, checkpoint_dir)


def final_sessions(spark: SparkSession, out_dir: str) -> DataFrame:
    """Reconstruct the session table across epochs: every closed
    session, plus each user's latest open session."""
    from pyspark.sql import functions as F

    rows = spark.read.schema(SESSION_OUTPUT_SCHEMA + ", epoch long").option(
        "recursiveFileLookup", "true"
    ).parquet(out_dir)
    closed = rows.filter("closed").dropDuplicates(
        ["user_id", "session_start"]
    )
    # the open session: latest emitted row per user that never closed
    latest_open = (
        rows.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("session_start", "session_end", "n_events", "closed"),
                F.struct("epoch", "session_start"),
            ).alias("s")
        )
        .filter(~F.col("s.closed"))
        .select(
            "user_id", "s.session_start", "s.session_end", "s.n_events",
            "s.closed",
        )
    )
    # an open session in epoch k may have CLOSED in epoch k+1; keep the
    # open row only if no closed row shares its (user, start)
    latest_open = latest_open.join(
        closed.select("user_id", "session_start"),
        ["user_id", "session_start"],
        "left_anti",
    )
    return closed.select(
        "user_id", "session_start", "session_end", "n_events", "closed"
    ).unionByName(latest_open)


DOCS_STREAM_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
DEDUP_OUTPUT_SCHEMA = "fp string, n_dups long, representative long"
DEDUP_STATE_SCHEMA = "n long, representative long"


def _update_dedup(
    key: Tuple[str],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, rep = state.get if state.exists else (0, None)
    for pdf in batches:
        n += len(pdf)
        m = int(pdf["doc_id"].min())
        rep = m if rep is None or m < rep else rep
    state.update((n, rep))
    yield pd.DataFrame(
        {"fp": [key[0]], "n_dups": [n], "representative": [rep]}
    )


def streaming_dedup_exact(spark: SparkSession, input_dir: str) -> DataFrame:
    """Exact dedup ON ARRIVAL — the streaming twin of the batch
    ``dedup_exact`` operator (same key: md5(text); same output grain:
    fp, n_dups, representative = min doc_id). Per-key state is two
    longs (count + min id); min/count merges are associative and
    commutative, so the FINAL state equals the batch groupBy under ANY
    arrival order or epoch split — not just doc_id-ordered feeds
    (pytest-gated with a shuffled random-epoch stress). This is the
    incremental-crawl shape: each new crawl increment streams through,
    duplicate counts accumulate, and the canonical choice never
    flip-flops on restart because it is an order-free min."""
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(input_dir)
    keyed = stream.withColumn("fp", F.md5("text"))
    return keyed.groupBy("fp").applyInPandasWithState(
        _update_dedup,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain_dedup_exact(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain available document files through the dedup operator."""
    _drain(streaming_dedup_exact(spark, input_dir), out_dir, checkpoint_dir)


def latest_dedup(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per fingerprint, the most recent dedup row across all epochs."""
    from pyspark.sql import functions as F

    rows = spark.read.schema(DEDUP_OUTPUT_SCHEMA + ", epoch long").option(
        "recursiveFileLookup", "true"
    ).parquet(out_dir)
    latest = F.max_by(
        F.struct("n_dups", "representative"), F.col("epoch")
    ).alias("s")
    return rows.groupBy("fp").agg(latest).select(
        "fp", "s.n_dups", "s.representative"
    )


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
