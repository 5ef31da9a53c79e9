"""Approximate-nearest-neighbor search over the `embeddings` table.

Baseline: brute-force cosine top-k (scan × broadcast query vector, all
math in JVM higher-order functions — no UDF). Scale path: IVF — cluster
centroids (here the `label` partitions), probe the nprobe nearest
centroids, brute-force only inside them. At 100 TB the IVF scan prunes
(1 - nprobe/nlist) of the data; centroids are a tiny broadcast table.

Determinism: cosine in float64, round(4), tie-break vec_id asc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyf_aggregator_spark.registry import load, register

TOP_K = 20
N_PROBE = 2
QUERY_VEC_ID = 0


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, z: acc + z
    )


def _norm(x: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(x, lambda p: p * p), F.lit(0.0), lambda a, z: a + z)
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


_DOT_SQL = (
    "list_sum(list_transform(range(1, len({a})+1), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
)
_NORM_SQL = "sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"


@register(
    "sim_cosine_topk_brute",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
    SELECT vec_id,
           round({_DOT_SQL.format(a='embedding', b='qv')}
                 / ({_NORM_SQL.format(a='embedding')} * {_NORM_SQL.format(a='qv')}),
                 4) AS cosine
    FROM embeddings CROSS JOIN q
    ORDER BY round({_DOT_SQL.format(a='embedding', b='qv')}
                 / ({_NORM_SQL.format(a='embedding')} * {_NORM_SQL.format(a='qv')}), 4) DESC,
             vec_id ASC
    LIMIT {TOP_K}
    """,
)
def sim_cosine_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against the query vector (vec_id=0):
    full scan × 1-row broadcast, TakeOrdered top-k — the exact baseline
    every ANN variant is measured against."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv")
    )
    cos = _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
    return (
        e.crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cos, 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@register(
    "sim_cosine_topk_ivf",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    cent_elem AS (
      SELECT label, i, avg(v) AS c
      FROM (
        SELECT label, unnest(embedding) AS v,
               unnest(range(1, len(embedding)+1)) AS i
        FROM embeddings
      ) GROUP BY label, i
    ),
    centroids AS (
      SELECT label, list(c ORDER BY i) AS cv FROM cent_elem GROUP BY label
    ),
    probed AS (
      SELECT label FROM centroids CROSS JOIN q
      ORDER BY round({_DOT_SQL.format(a='cv', b='qv')}
               / ({_NORM_SQL.format(a='cv')} * {_NORM_SQL.format(a='qv')}), 4) DESC,
               label ASC
      LIMIT {N_PROBE}
    )
    SELECT vec_id,
           round({_DOT_SQL.format(a='embedding', b='qv')}
                 / ({_NORM_SQL.format(a='embedding')} * {_NORM_SQL.format(a='qv')}),
                 4) AS cosine
    FROM embeddings CROSS JOIN q
    WHERE label IN (SELECT label FROM probed)
    ORDER BY round({_DOT_SQL.format(a='embedding', b='qv')}
                 / ({_NORM_SQL.format(a='embedding')} * {_NORM_SQL.format(a='qv')}), 4) DESC,
             vec_id ASC
    LIMIT {TOP_K}
    """,
)
def sim_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k: per-label centroids (posexplode + elementwise avg),
    probe the N_PROBE nearest centroids, brute-force inside them only.

    The centroid table is nlist rows → broadcast; the data scan is
    partition-prunable by label at scale."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))

    cent = (
        e.select("label", F.posexplode("v").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]
            ).alias("cv")
        )
    )
    ccos = _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    probed = (
        cent.crossJoin(F.broadcast(q))
        .select("label", F.round(ccos, 4).alias("ccos"))
        .orderBy(F.desc("ccos"), F.asc("label"))
        .limit(N_PROBE)
        .select("label")
    )
    cos = _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
    return (
        e.join(F.broadcast(probed), "label")
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cos, 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


# ----------------------------------------------------- k-means IVF training


def kmeans_fit(emb: DataFrame, k: int = 8, n_iter: int = 5) -> DataFrame:
    """Deterministic Lloyd's k-means as DataFrame algebra — the IVF
    training step (round 1 used given labels as centroids; real IVF
    learns them).

    Init = the k vectors with smallest vec_id (deterministic, no RNG —
    production would use k-means|| with a configured seed). Each
    iteration: broadcast the k×dim centroid table, assign every vector
    to its nearest centroid (squared-L2 via zip_with/aggregate, all
    JVM), recompute elementwise means via posexplode + two-phase agg.
    Only k×dim floats ever reach the driver per iteration; the data
    side is one narrow scan + one groupBy per iteration at any scale.

    Returns DataFrame(cluster int, cv array<double>)."""
    spark = emb.sparkSession
    v = emb.select("vec_id", "v").persist()
    cents = [list(map(float, r["v"])) for r in v.orderBy("vec_id").limit(k).collect()]

    def centroid_df(cs):
        return spark.createDataFrame(
            [(i, c) for i, c in enumerate(cs)], "cluster int, cv array<double>"
        )

    for _ in range(n_iter):
        cdf = centroid_df(cents)
        d2 = F.aggregate(
            F.zip_with(F.col("v"), F.col("cv"), lambda p, q: (p - q) * (p - q)),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
        from pyspark.sql import Window

        w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cluster"))
        assigned = (
            v.crossJoin(F.broadcast(cdf))
            .select("vec_id", "v", "cluster", d2.alias("d2"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        means = (
            assigned.select("cluster", F.posexplode("v").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.avg("x").alias("c"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "c"))),
                    lambda s: s["c"],
                ).alias("cv")
            )
        )
        got = {r["cluster"]: list(map(float, r["cv"])) for r in means.collect()}
        cents = [got.get(i, cents[i]) for i in range(k)]  # empty cluster keeps its centroid
    v.unpersist()
    return centroid_df(cents)


def ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every vector to its nearest learned centroid — the IVF
    index-build step (at scale this is the write-side partitioning
    column: cluster = the partition/bucket key)."""
    from pyspark.sql import Window

    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda p, q: (p - q) * (p - q)),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cluster"))
    return (
        emb.select("vec_id", "v")
        .crossJoin(F.broadcast(centroids))
        .select("vec_id", "v", "cluster", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cluster")
    )


def ivf_topk_batch(
    assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
    k: int = 10, nprobe: int = 2,
) -> DataFrame:
    """Batched IVF ANN: queries(query_id, qv) → per-query cosine top-k
    scanning only each query's nprobe nearest clusters, ONE Spark job
    for the whole query set (probe selection and scan both shuffle-free:
    queries × centroids is a broadcast cross of two tiny tables, and the
    data join hits only the probed clusters — partition-prunable when
    the table is written bucketed by cluster)."""
    from pyspark.sql import Window

    ccos = _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cluster"))
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select("query_id", "qv", "cluster", F.round(ccos, 6).alias("ccos"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "cluster")
    )
    cos = _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        assigned.join(F.broadcast(probes), "cluster")
        .select("query_id", "vec_id", F.round(cos, 4).alias("cosine"))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
