"""Explicit skew handling: salted two-level aggregation.

AQE's skew handling covers JOINS but not custom aggregations whose
reduce-side state concentrates on Zipf-head keys (SURVEY §4 item 2).
For plain algebraic aggregates Spark's map-side partial agg already
bounds reducer input at P rows/key — salting matters when the per-key
state is NOT collapsible map-side (e.g. collect-like or high-cardinality
composite state). The utility is the documented pattern:

    key → (key, salt = hash(row) % S)  →  partial agg per (key, salt)
        →  final agg per key (S rows/key, never N)

Registered with an oracle to prove salting is RESULT-transparent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyf_aggregator_spark.registry import load, register


def salted_agg(
    df: DataFrame,
    key: str,
    value: Column,
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """count + sum of ``value`` per key via salt-then-merge.

    ``salt_on``: a column whose md5 spreads rows (deterministic; default
    a uniform row attribute). Deterministic salting keeps re-runs
    byte-identical (the resumability invariant), unlike rand()."""
    salt_src = F.col(salt_on) if salt_on else value
    salted = df.withColumn(
        "_salt",
        (F.conv(F.substring(F.md5(salt_src.cast("string").cast("binary")), 1, 4), 16, 10)
         % n_salts).cast("int"),
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_n"), F.sum(value).alias("_s")
    )
    return partial.groupBy(key).agg(
        F.sum("_n").cast("long").alias("n"),
        F.sum("_s").alias("total"),
    )


@register(
    "skew_salted_event_agg",
    """
    SELECT event_type, count(*) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def skew_salted_event_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-level aggregation over the 5-value (maximally skewed)
    event_type key — result identical to the direct groupBy (the oracle
    IS the direct form)."""
    ev = load(spark, sf_dir, "events")
    out = salted_agg(ev, "event_type", F.col("value"), n_salts=8, salt_on="event_id")
    return out.select(
        "event_type", "n", F.round("total", 4).alias("total")
    ).orderBy("event_type")
