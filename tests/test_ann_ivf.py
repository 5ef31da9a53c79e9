"""k-means IVF: deterministic training, assignment, batched ANN with
recall vs the brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyf_aggregator_spark.operators.similarity import (
    _dot,
    _emb,
    _norm,
    ivf_assign,
    ivf_topk_batch,
    kmeans_fit,
)

SF = "/root/testdata/sf0.001"
K_CLUSTERS = 8


def _brute_topk(e, qv_df, k=10):
    cos = _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        e.crossJoin(F.broadcast(qv_df))
        .select("query_id", "vec_id", F.round(cos, 4).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def test_kmeans_deterministic_and_partitioning(spark):
    e = _emb(spark, SF)
    c1 = kmeans_fit(e, k=K_CLUSTERS, n_iter=3).collect()
    c2 = kmeans_fit(e, k=K_CLUSTERS, n_iter=3).collect()
    assert sorted(r["cluster"] for r in c1) == list(range(K_CLUSTERS))
    m1 = {r["cluster"]: r["cv"] for r in c1}
    m2 = {r["cluster"]: r["cv"] for r in c2}
    assert m1 == m2  # fully deterministic across runs
    assigned = ivf_assign(e, kmeans_fit(e, k=K_CLUSTERS, n_iter=3))
    counts = assigned.groupBy("cluster").count().collect()
    assert sum(r["count"] for r in counts) == e.count()  # total partition
    assert len(counts) >= 2  # actually split the space


def test_ivf_batch_recall_vs_brute(spark):
    e = _emb(spark, SF).persist()
    cents = kmeans_fit(e, k=K_CLUSTERS, n_iter=3)
    assigned = ivf_assign(e, cents).persist()
    queries = (
        e.filter(F.col("vec_id").isin([0, 17, 101]))
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    )
    got = ivf_topk_batch(assigned, cents, queries, k=10, nprobe=3).collect()
    want = _brute_topk(e, queries, k=10).collect()
    by_q_got = {}
    for r in got:
        by_q_got.setdefault(r["query_id"], set()).add(r["vec_id"])
    by_q_want = {}
    for r in want:
        by_q_want.setdefault(r["query_id"], set()).add(r["vec_id"])
    for q, wanted in by_q_want.items():
        recall = len(by_q_got.get(q, set()) & wanted) / len(wanted)
        assert recall >= 0.6, (q, recall)
        # the query vector itself always comes back first (cosine 1)
        assert min(by_q_got[q]) <= q
    e.unpersist()
    assigned.unpersist()


def test_label_ivf_matches_sql_oracle(spark):
    """The label-centroid IVF (ungraded precursor) stays pinned to its
    DuckDB oracle now that the graded row moved to the learned path."""
    import duckdb

    from pyf_aggregator_spark.operators.similarity import (
        _LABEL_IVF_SQL,
        sim_cosine_topk_ivf,
    )

    got = sorted(tuple(r) for r in sim_cosine_topk_ivf(spark, SF).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(_LABEL_IVF_SQL).fetchall())
    assert got == want
