"""Relational operator breadth (SURVEY.md §2.2-§2.6) over the driver tables.

Each operator the reference implements (as hand-coded Python over dicts
or as Typesense search params) re-expressed as declarative DataFrame
ops so Catalyst gets pushdown/pruning/join-selection for free. Oracle
SQL mirrors each query 1:1 for the DuckDB correctness gate.

Scale notes are per-operator docstrings; the common rules:
- dimension tables (region/nation/customer/supplier/part) broadcast;
- groupBy aggregations rely on map-side partial agg (no skew keys here);
- top-k = orderBy+limit → TakeOrdered (per-partition heap, k-row merge),
  never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyf_aggregator_spark.registry import load, register

# ------------------------------------------------------------------ filters


@register(
    "f2_name_substring_filter",
    """
    SELECT p_partkey, p_name FROM part
    WHERE p_name LIKE '%ol%'
    ORDER BY p_partkey
    """,
)
def f2_name_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: `filter_name in package_id` (fetcher.py:374) → contains()."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("ol"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@register(
    "f3_exact_match_filter",
    """
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_mktsegment = 'BUILDING'
    ORDER BY c_custkey
    """,
)
def f3_exact_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: Typesense `filter_by: name:=X` (db.py:316-318) → equality.

    Catalyst pushes this into the parquet scan (PushedFilters)."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "f5_f6_limit_projection",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
    """,
)
def f5_limit_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5+F6: limit N + include_fields projection (db.py:270).

    Column pruning reaches the scan (ReadSchema shows 2 columns);
    orderBy+limit compiles to TakeOrdered, not a global sort."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


@register(
    "f1_prefix_filter_array",
    """
    SELECT doc_id, source FROM documents
    WHERE source LIKE 'src1%'
    ORDER BY doc_id
    """,
)
def f1_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 scalar form: classifier prefix filter (fetcher.py:582-602).

    The array-of-classifiers form (F.exists + startswith) is covered in
    transforms.py over the package fixture; here the prefix predicate
    over a driver column, pushed down as StartsWith."""
    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("source").startswith("src1"))
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


# ------------------------------------------------------------------- joins


@register(
    "j2_equijoin_agg",
    """
    SELECT o.o_orderpriority AS priority,
           count(*) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
)
def j2_equijoin_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: equi-join on key + aggregation (npm README attach analog).

    fact⋈fact shuffle join on the key; AQE picks broadcast when the
    build side is small at runtime."""
    li, orders = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("priority")
    )


@register(
    "j3_anti_join_deletion_set",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
)
def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: deletion set = left anti join (main.py:207-237 analog)."""
    cust, orders = load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "j4_semi_join_enrichment_keys",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    ORDER BY c_custkey
    """,
)
def j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 pattern: dedup keys before an enrichment lookup = semi join
    (github.py:126-137 memoization analog)."""
    cust, orders = load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    return (
        cust.join(
            orders.filter(F.col("o_totalprice") > 200000),
            cust.c_custkey == orders.o_custkey,
            "left_semi",
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "j_broadcast_dim_join",
    """
    SELECT n.n_name AS nation, count(*) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_balance
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def j_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dim join: explicit broadcast() — no shuffle of the fact side."""
    cust, nation = load(spark, sf_dir, "customer"), load(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
        .orderBy("nation")
    )


# ------------------------------------------------------------- aggregations


@register(
    "a1_newest_per_group",
    """
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC
             ) AS rn
      FROM orders
    ) WHERE rn = 1
    ORDER BY o_custkey
    """,
)
def a1_newest_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/W1: group_by name, group_limit 1 + sort_by ts desc
    (db.py:250-305, db.py:414-421): newest doc per group via window
    top-1. One shuffle on the group key."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    )


@register(
    "a2_distinct_ordered",
    "SELECT DISTINCT c_mktsegment AS segment FROM customer ORDER BY segment",
)
def a2_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: SELECT DISTINCT … ORDER BY (bigquery_discovery.py:83-90)."""
    return (
        load(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("segment"))
        .distinct()
        .orderBy("segment")
    )


@register(
    "a3_status_counts",
    """
    SELECT o_orderstatus AS status, count(*) AS n
    FROM orders GROUP BY o_orderstatus ORDER BY status
    """,
)
def a3_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: stats dicts {updated, deleted, …} (main.py:81) → groupBy count."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count("*").alias("n"))
        .orderBy("status")
    )


@register(
    "a5_facet_counts",
    """
    SELECT lang AS facet_value, count(*) AS n
    FROM documents GROUP BY lang ORDER BY n DESC, facet_value
    """,
)
def a5_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: facet counts for a `facet: True` field (db.py:96-220)."""
    return (
        load(spark, sf_dir, "documents")
        .groupBy(F.col("lang").alias("facet_value"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "facet_value")
    )


@register(
    "a_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(avg(l_quantity), 6)                                   AS avg_qty,
           round(avg(l_extendedprice), 6)                              AS avg_price,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def a_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical scan→filter→agg
    pipeline; filter pushed to the scan, two-phase agg, tiny result."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ----------------------------------------------------------------- windows


@register(
    "w_running_sum_per_user",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 4) AS running_value
    FROM events
    ORDER BY user_id, event_id
    """,
)
def w_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window beyond the reference's top-1 pattern: running aggregate
    per key (event-sourced state reconstruction)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(w), 4).alias("running_value"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "w4_global_sort",
    "SELECT n_nationkey, n_name FROM nation ORDER BY n_name",
)
def w4_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: ORDER BY name (bigquery_discovery.py:89)."""
    return load(spark, sf_dir, "nation").select("n_nationkey", "n_name").orderBy("n_name")


@register(
    "w_tumbling_window_agg",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def w_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-analog (batch form): tumbling event-time window aggregation —
    the batch twin of the Structured Streaming windowed agg (§2.9)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy("window_start", "event_type")
    )


# ----------------------------------------------------------------- set ops


@register(
    "u1_union_dedup_newest",
    """
    SELECT user_id, event_id, ts FROM (
      SELECT user_id, event_id, ts,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM (
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
      )
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)
def u1_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: feed union + dedup keeping newest (fetcher.py:411-424)."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    unioned = ev.filter(F.col("event_type") == "click").unionByName(
        ev.filter(F.col("event_type") == "purchase")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        unioned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts")
        .orderBy("user_id")
    )


@register(
    "u3_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY c_custkey
    """,
)
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: names-in-collection minus subset (db.py:292-304)."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    done = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.exceptAll(done.distinct()).distinct().orderBy("c_custkey")
