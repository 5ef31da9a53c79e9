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
    "f2_f3_f5_f6_filters",
    """
    SELECT p_partkey, p_name, p_brand FROM part
    WHERE p_name LIKE '%ol%' AND p_brand = 'Brand#13'
    ORDER BY p_partkey LIMIT 50
    """,
)
def f2_f3_f5_f6_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2+F3+F5+F6 in one pipeline: substring filter (`filter_name in
    package_id`, fetcher.py:374), exact-match filter (Typesense
    `filter_by: name:=X`, db.py:316-318), projection (include_fields,
    db.py:270), limit. Both predicates and the 3-column pruning reach
    the parquet scan (PushedFilters/ReadSchema — plan-audited in
    test_plans.py); orderBy+limit compiles to TakeOrdered."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("ol") & (F.col("p_brand") == "Brand#13"))
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
        .limit(50)
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
    "j3_j4_anti_semi_joins",
    """
    SELECT 'anti' AS op, c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'semi' AS op, c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    ORDER BY op, c_custkey
    """,
)
def j3_j4_anti_semi_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 + J4 in one graded row (labeled by ``op``), keeping both join
    shapes inside the driver's bounded grading window:

    - J3 deletion set = left ANTI join (main.py:207-237 analog);
    - J4 dedup-keys-before-enrichment = left SEMI join
      (github.py:126-137 memoization analog).

    Both sides broadcast the orders keys when small; neither
    materializes the join payload (anti/semi never widen rows)."""
    cust, orders = load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(F.lit("anti").alias("op"), "c_custkey", "c_name")
    )
    semi = (
        cust.join(
            orders.filter(F.col("o_totalprice") > 200000),
            cust.c_custkey == orders.o_custkey,
            "left_semi",
        )
        .select(F.lit("semi").alias("op"), "c_custkey", "c_name")
    )
    return anti.unionByName(semi).orderBy("op", "c_custkey")


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


# ------------------------------------------------------------- S7 attach


def _s7_sql() -> str:
    from pyf_aggregator_spark.fixtures.packages import (
        npm_docs_values_sql,
        npm_versions_values_sql,
        readme_files_values_sql,
    )

    return f"""
    WITH {npm_versions_values_sql()},
    {readme_files_values_sql()},
    {npm_docs_values_sql()},
    exact AS (
      SELECT name, version, content AS exact_content
      FROM readme_files
      WHERE filename = 'README.md' AND ftype = 'file'
    ),
    listed AS (
      SELECT name, version, content AS listed_content
      FROM (
        SELECT name, version, content,
               row_number() OVER (
                 PARTITION BY name, version ORDER BY file_idx
               ) AS rn
        FROM readme_files
        WHERE ftype = 'file'
          AND lower(filename) LIKE 'readme%'
          AND filename <> 'README.md'
      ) WHERE rn = 1
    )
    SELECT v.name, v.version,
           coalesce(e.exact_content, l.listed_content, d.latest_readme)
             AS readme,
           CASE WHEN e.exact_content IS NOT NULL THEN 'file'
                WHEN l.listed_content IS NOT NULL THEN 'listing'
                WHEN d.latest_readme IS NOT NULL THEN 'package'
                ELSE 'none' END AS readme_source
    FROM npm_versions v
    LEFT JOIN exact e USING (name, version)
    LEFT JOIN listed l USING (name, version)
    LEFT JOIN npm_docs d ON v.name = d.name
    ORDER BY v.name, v.version
    """


@register("s7_readme_attach", _s7_sql())
def s7_readme_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — secondary-content fetch as a ranked-fallback ATTACH
    (npm_fetcher.py:394-474 get_version_readme + orchestration
    :704-786): per (name, version), README resolution is a 3-level
    cascade — (1) the exact root README.md when it is a real FILE
    (a directory of that name must not satisfy it), (2) else the FIRST
    file in listing order whose name starts with 'readme'
    case-insensitively (the reference's file-listing API walk; its
    `filename != "README.md"` guard mirrored), (3) else the package
    document's latest-version readme; 'none' when all three miss.

    Spark shape: three broadcast-joined left lookups against the
    version table — the per-version network fan-out of the reference
    becomes two dim-table joins + a window top-1 on the listing, all
    broadcastable at catalog scale (the readme corpus is the big side
    at 100 TB and it arrives pre-joined by key, never shuffled twice)."""
    from pyf_aggregator_spark.fixtures.packages import (
        npm_docs_df,
        npm_versions_df,
        readme_files_df,
    )

    vers = npm_versions_df(spark)
    files = readme_files_df(spark)
    exact = (
        files.filter(
            (F.col("filename") == "README.md") & (F.col("ftype") == "file")
        ).select("name", "version", F.col("content").alias("exact_content"))
    )
    w = Window.partitionBy("name", "version").orderBy("file_idx")
    listed = (
        files.filter(
            (F.col("ftype") == "file")
            & F.lower("filename").startswith("readme")
            & (F.col("filename") != "README.md")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("name", "version", F.col("content").alias("listed_content"))
    )
    docs = npm_docs_df(spark).select("name", "latest_readme")
    out = (
        vers.join(F.broadcast(exact), ["name", "version"], "left")
        .join(F.broadcast(listed), ["name", "version"], "left")
        .join(F.broadcast(docs), "name", "left")
    )
    return out.select(
        "name",
        "version",
        F.coalesce("exact_content", "listed_content", "latest_readme").alias(
            "readme"
        ),
        F.when(F.col("exact_content").isNotNull(), "file")
        .when(F.col("listed_content").isNotNull(), "listing")
        .when(F.col("latest_readme").isNotNull(), "package")
        .otherwise("none")
        .alias("readme_source"),
    ).orderBy("name", "version")
