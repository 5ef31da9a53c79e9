"""C13 + S4: JSON restructuring and pushdown-style semi-structured ops.

The reference restructures the fetched package JSON (fetcher.py:565-580:
lift info.*, keep urls, drop downloads/md5) and pushes classifier
predicates into BigQuery SQL (bigquery_discovery.py:51-103). Spark-
native: `from_json` with an explicit schema + column pruning; the
`events.props` JSON column plays the semi-structured payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyf_aggregator_spark.registry import load, register

PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])


@register(
    "c13_json_restructure",
    """
    SELECT event_id, event_type,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INTEGER) >= 90
    ORDER BY event_id
    """,
)
def c13_json_restructure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13: parse the JSON payload with an explicit schema, lift a
    nested field to a column, filter on it (fetcher.py:565-580 +
    the classifier-predicate pushdown shape)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("p", F.from_json("props", PROPS_SCHEMA))
        .select("event_id", "event_type", F.col("p.k").alias("k"))
        .filter(F.col("k") >= 90)
        .orderBy("event_id")
    )
