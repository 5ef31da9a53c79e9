"""Registry entries for the Structured Streaming pipeline (§2.9).

Each runs a real stream to completion (AvailableNow) and is checked
against a batch SQL oracle — deterministic because the streaming
results here are content-defined (windowed counts, key-distinct
counts), not arrival-order-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyf_aggregator_spark.registry import register
from pyf_aggregator_spark.streaming.pipeline import (
    stream_dedup_within_watermark,
    stream_incremental_watermark_cutoff,
    stream_windowed_agg,
)


@register(
    "st_windowed_agg",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    HAVING date_trunc('hour', min(ts)) + INTERVAL 1 HOUR
           <= (SELECT max(ts) - INTERVAL 30 MINUTE FROM events)
    ORDER BY window_start, event_type
    """,
)
def st_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+T3: streaming tumbling-window agg. Append mode emits only
    windows CLOSED by the final watermark (max ts − 30 min delay) — the
    oracle mirrors that closure rule; the batch twin without it is
    w_tumbling_window_agg."""
    return stream_windowed_agg(spark, sf_dir)


@register(
    "st_dedup_within_watermark",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_first_seen
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def st_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: watermark-bounded streaming dedup — first-seen count per key
    equals the batch distinct count (which row survives is order-
    dependent, the count is not)."""
    return stream_dedup_within_watermark(spark, sf_dir)


@register(
    "st_incremental_cutoff",
    """
    SELECT event_type, count(*) AS n, max(ts) AS new_watermark
    FROM events WHERE ts > TIMESTAMP '2024-01-01 12:00:00'
    GROUP BY event_type ORDER BY event_type
    """,
)
def st_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3/T5: since-watermark incremental scan + new-watermark emit."""
    return stream_incremental_watermark_cutoff(spark, sf_dir)
