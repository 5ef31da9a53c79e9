"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the input_hint's escape hatch for operators
Structured Streaming lacks natively).

Semantics: per user_id, consecutive events belong to one session while
the gap between them is < GAP; a session CLOSES when the event-time
watermark passes session_end + GAP (state timeout). Closed sessions are
emitted as (user_id, session_start, session_end, n_events,
total_value); in-flight sessions stay in state — correct unbounded-
stream semantics. On bounded input with a 0-delay watermark the final
no-data micro-batch advances the watermark to max(ts), so exactly the
sessions with session_end + GAP ≤ max(ts) are emitted — which is what
``batch_sessionize`` (the deterministic batch twin / test oracle)
computes with window functions.

Scale shape: state is one tiny tuple per ACTIVE user (not per event);
each micro-batch shuffles only on user_id; emitted rows stream out —
nothing accumulates beyond the open-session map, and the timeout bound
makes state size O(active users within the gap window).
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_MINUTES = 30
_GAP_US = GAP_MINUTES * 60 * 1_000_000

OUTPUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, "
    "n_events long, total_value double"
)
STATE_SCHEMA = "start_us long, end_us long, n long, total double"


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    closed: list[tuple] = []

    if state.hasTimedOut:
        start_us, end_us, n, total = state.get
        closed.append((user_id, start_us, end_us, n, total))
        state.remove()
    else:
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        cur = list(state.get) if state.exists else None
        for ts_us, value in zip(rows["ts_us"], rows["value"]):
            ts_us = int(ts_us)
            if cur is None:
                cur = [ts_us, ts_us, 0, 0.0]
            elif ts_us - cur[1] >= _GAP_US:
                closed.append((user_id, cur[0], cur[1], cur[2], cur[3]))
                cur = [ts_us, ts_us, 0, 0.0]
            # out-of-order events (possible across micro-batches on real
            # unbounded input) must not move session_end backwards — a
            # shrunken end could put the timeout at/below the watermark,
            # which raises and kills the query
            cur[0] = min(cur[0], ts_us)
            cur[1] = max(cur[1], ts_us)
            cur[2] += 1
            cur[3] += float(value)
        state.update(tuple(cur))
        # close when the watermark passes session_end + GAP; never at or
        # below the current watermark (guards the same failure mode when
        # session_end itself lags the watermark)
        state.setTimeoutTimestamp(
            max((cur[1] + _GAP_US) // 1000, state.getCurrentWatermarkMs() + 1)
        )

    if closed:
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id", "session_start_us", "session_end_us",
                "n_events", "total_value",
            ],
        )


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events stream → closed sessions (AvailableNow, memory sink)."""
    from pyf_aggregator_spark.session import ensure_py_files
    from pyf_aggregator_spark.streaming.pipeline import _events_stream

    ensure_py_files(spark)
    ev = (
        _events_stream(spark, sf_dir)
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .select("user_id", "event_id", "ts", "ts_us", "value")
        .withWatermark("ts", "0 seconds")
    )
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    name = f"sessions_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(tempfile.gettempdir(), "pyfagg_ckpt", name)
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    return out.select(
        "user_id",
        F.timestamp_micros("session_start_us").alias("session_start"),
        F.timestamp_micros("session_end_us").alias("session_end"),
        "n_events",
        F.round("total_value", 4).alias("total_value"),
    ).orderBy("user_id", "session_start")


def batch_sessionize(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """Deterministic batch twin: lag-gap boundaries → running session
    ids → per-session aggregates; keep only sessions the stream would
    have CLOSED (session_end + gap ≤ global max ts)."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev = events.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) >= gap_us, 1
        ).otherwise(0),
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    max_ts = ev.agg(F.max("ts_us")).collect()[0][0]
    return (
        flagged.groupBy("user_id", "sess_id")
        .agg(
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .filter(F.col("end_us") + gap_us <= F.lit(max_ts))
        .select(
            "user_id",
            F.timestamp_micros("start_us").alias("session_start"),
            F.timestamp_micros("end_us").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )
