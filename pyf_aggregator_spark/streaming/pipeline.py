"""Structured Streaming analogs of the reference's queue layer (§2.9).

The reference "streams" via Celery-beat micro-batch polling
(queue.py:1140-1206): RSS every minute (T1), Redis SET-NX dedup with a
TTL window (T4), a since-file event-time watermark (T3), at-least-once
delivery + idempotent upsert (T2). Spark-native mapping:

  T1  file-source micro-batches, Trigger.AvailableNow
  T3  withWatermark on the event-time column
  T4  dropDuplicatesWithinWatermark
  T2  exactly-once sink semantics via checkpointed idempotent writes
  agg windowed aggregation (tumbling, append mode)

Each entry point runs the stream to completion (AvailableNow) against
the tier's events parquet and returns the RESULT as a normal DataFrame,
so the driver/tests can compare it with the batch twin.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the file-stream source requires a DIRECTORY; the tier ships a single
    # parquet file → stage a per-tier symlink dir (read-only testdata stays
    # untouched)
    tier = os.path.basename(sf_dir.rstrip("/"))
    stream_dir = os.path.join(tempfile.gettempdir(), "pyfagg_stream", tier)
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), link)
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Drive a streaming frame to completion with AvailableNow and a
    memory sink; return the sink contents."""
    spark = stream_df.sparkSession
    name = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(tempfile.gettempdir(), "pyfagg_ckpt", name)
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+T3+agg: tumbling 1-hour event-time windows with a 30-minute
    watermark, append mode — the streaming twin of
    w_tumbling_window_agg (same result on bounded input because
    AvailableNow's final no-data micro-batch flushes every window)."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )
    out = _run_to_memory(agg, "append")
    return out.select(
        F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
    ).orderBy("window_start", "event_type")


def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: the Redis SET-NX-EX dedup window (queue.py:46-49, :507-587)
    as dropDuplicatesWithinWatermark on the business key — stateful,
    bounded by the watermark exactly like the Redis TTL."""
    ev = _events_stream(spark, sf_dir)
    deduped = ev.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    counted = deduped.groupBy("event_type").agg(F.count("*").alias("n_first_seen"))
    # complete mode: the count is over all first-seen rows
    out = _run_to_memory(counted, "complete")
    return out.orderBy("event_type")


def stream_incremental_watermark_cutoff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T3/T5: the since-file cutoff (fetcher.py:107-117) — process only
    events newer than a stored watermark, emit per-type counts. The
    batch analog of an incremental snapshot read."""
    cutoff = "2024-01-01 12:00:00"
    ev = _events_stream(spark, sf_dir).filter(F.col("ts") > F.lit(cutoff))
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.max("ts").alias("new_watermark")
    )
    out = _run_to_memory(agg, "complete")
    return out.orderBy("event_type")
