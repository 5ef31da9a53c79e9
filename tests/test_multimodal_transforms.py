"""Multimodal transform plumbing: resize (map), frame-sample (1:N
expansion), feature-extract (payload → array<float>) feeding the ANN
operators end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyf_aggregator_spark.operators.multimodal import (
    media_table,
    mm_feature_extract,
    mm_frame_sample,
    mm_resize,
)
from pyf_aggregator_spark.operators.similarity import ivf_assign, ivf_topk_batch, kmeans_fit

SF = "/root/testdata/sf0.001"


def _media(spark):
    from pyf_aggregator_spark.session import ensure_py_files

    ensure_py_files(spark)
    return media_table(spark, SF).limit(100)


def test_resize_shape_and_determinism(spark):
    m = _media(spark)
    out = mm_resize(m, 8, 4).collect()
    assert len(out) == 100
    assert all(len(r["payload"]) == 32 and r["width"] == 8 for r in out)
    again = {r["doc_id"]: r["payload"] for r in mm_resize(m, 8, 4).collect()}
    assert all(again[r["doc_id"]] == r["payload"] for r in out)


def test_frame_sample_expands(spark):
    m = _media(spark)
    frames = mm_frame_sample(m, every_n=5).collect()
    assert len(frames) > 100  # 1:N expansion happened
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(idxs == sorted(idxs) and idxs[0] == 0 for idxs in per_doc.values())
    assert all(idx % 5 == 0 for idxs in per_doc.values() for idx in idxs)


def test_feature_extract_feeds_ann(spark):
    m = _media(spark)
    emb = mm_feature_extract(m).select(
        F.col("doc_id").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).persist()
    rows = emb.collect()
    assert all(len(r["v"]) == 16 for r in rows)
    # unit-norm-ish vectors
    import math

    n = math.sqrt(sum(x * x for x in rows[0]["v"]))
    assert abs(n - 1.0) < 1e-3
    cents = kmeans_fit(emb, k=4, n_iter=2)
    assigned = ivf_assign(emb, cents)
    queries = emb.limit(1).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    hits = ivf_topk_batch(assigned, cents, queries, k=5, nprobe=2).collect()
    assert len(hits) == 5
    assert hits[0]["vec_id"] == queries.collect()[0]["query_id"]  # self first
    emb.unpersist()
