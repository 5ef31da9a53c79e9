"""End-to-end rank-identity: Spark engine top-k == NumPy oracle top-k.

This is the BASELINE.json correctness gate: top-k docIDs and scores
rank-identical on the reference query set, at two different
partitionings (summation-order robustness).
"""

from __future__ import annotations

import pytest

from pyf_aggregator_spark.fixtures.transcripts import (
    reference_queries,
    transcripts_df,
)
from pyf_aggregator_spark.index.builder import assign_doc_ids, build_index
from pyf_aggregator_spark.oracle.bm25 import NumpyBM25
from pyf_aggregator_spark.search.engine import bm25_topk, bm25_topk_batch

N_TURNS = 3000


@pytest.fixture(scope="module")
def corpus(spark):
    docs = assign_doc_ids(transcripts_df(spark, N_TURNS))
    index = build_index(docs).cache()
    pdf = docs.select("doc_id", "text").toPandas()
    oracle = NumpyBM25.fit(list(zip(pdf["doc_id"], pdf["text"])))
    yield index, oracle
    index.unpersist()


def test_docid_stable_and_ordered(spark):
    docs1 = assign_doc_ids(transcripts_df(spark, N_TURNS), num_partitions=4)
    docs2 = assign_doc_ids(transcripts_df(spark, N_TURNS), num_partitions=7)
    p1 = docs1.select("doc_id", "conv_id", "turn_idx", "text").toPandas().sort_values("doc_id")
    p2 = docs2.select("doc_id", "conv_id", "turn_idx", "text").toPandas().sort_values("doc_id")
    # docIDs are a pure function of (conv_id, turn_idx) order — partitioning-invariant
    assert p1["doc_id"].tolist() == list(range(len(p1)))
    assert (p1[["conv_id", "turn_idx", "text"]].values == p2[["conv_id", "turn_idx", "text"]].values).all()
    # per-turn text equality under stable ordering (the per-row invariant)
    keys = list(zip(p1["conv_id"], p1["turn_idx"]))
    assert keys == sorted(keys)


def test_rank_identity_reference_query_set(corpus):
    index, oracle = corpus
    for q in reference_queries():
        golden = oracle.topk(q["query"], k=q["k"], mode=q["mode"])
        got = [
            (i + 1, r["doc_id"], r["score"])
            for i, r in enumerate(bm25_topk(index, q["query"], k=q["k"], mode=q["mode"]).collect())
        ]
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in golden], q
        for (_, _, s_got), (_, _, s_gold) in zip(got, golden):
            assert s_got == pytest.approx(s_gold, rel=1e-6), q


def test_batch_matches_single(corpus, spark):
    index, oracle = corpus
    qs = reference_queries()
    qdf = spark.createDataFrame(
        [(q["query_id"], q["query"], q["mode"], q["k"]) for q in qs],
        "query_id string, query string, mode string, k int",
    )
    batch = bm25_topk_batch(index, qdf).toPandas()
    for q in qs:
        golden = oracle.topk(q["query"], k=q["k"], mode=q["mode"])
        sub = batch[batch["query_id"] == q["query_id"]].sort_values("rank")
        assert list(zip(sub["rank"], sub["doc_id"])) == [(r, d) for r, d, _ in golden], q


def test_needle_query_hits_planted_turn(corpus):
    index, oracle = corpus
    rows = bm25_topk(index, "quixotic zephyr marmalade", k=5, mode="and").collect()
    assert len(rows) == 1  # exactly one planted needle
