"""The oracle itself is verified against hand-computed BM25 values
(SURVEY §5 item 2) — so 'rank-identical to the oracle' is anchored to
arithmetic done by hand, not to another program.

Corpus (4 docs):
  d0: "cat dog"            len 2
  d1: "cat cat fish"       len 3
  d2: "dog bird"           len 2
  d3: "fish"               len 1
N = 4, total_len = 8, avgdl = 2.0

df: cat=2, dog=2, fish=2, bird=1
idf(cat)  = ln(1 + (4-2+0.5)/(2+0.5)) = ln(2)
idf(bird) = ln(1 + (4-1+0.5)/(1+0.5)) = ln(1 + 7/3) = ln(10/3)

tf-part(tf, dl) = tf*2.2 / (tf + 1.2*(0.25 + 0.75*dl/2))
  d1, cat: tf=2, dl=3 → 4.4 / (2 + 1.2*(0.25+1.125)) = 4.4/3.65
  d0, cat: tf=1, dl=2 → 2.2 / (1 + 1.2*(0.25+0.75)) = 2.2/2.2 = 1.0
"""

from __future__ import annotations

import math

import pytest

from pyf_aggregator_spark.oracle.bm25 import NumpyBM25

DOCS = [(0, "cat dog"), (1, "cat cat fish"), (2, "dog bird"), (3, "fish")]


@pytest.fixture(scope="module")
def oracle():
    return NumpyBM25.fit(DOCS)


def test_stats(oracle):
    assert oracle.n_docs == 4
    assert oracle.avgdl == 2.0
    assert len(oracle.postings["cat"]) == 2
    assert len(oracle.postings["bird"]) == 1


def test_idf_hand_computed(oracle):
    assert oracle.idf("cat") == pytest.approx(math.log(2.0))
    assert oracle.idf("bird") == pytest.approx(math.log(10.0 / 3.0))
    # unseen term: df=0 → ln(1 + 4.5/0.5) = ln(10)
    assert oracle.idf("zzz") == pytest.approx(math.log(10.0))


def test_single_term_scores_hand_computed(oracle):
    top = oracle.topk("cat", k=4)
    # d1: ln2 * 4.4/3.65 ; d0: ln2 * 1.0
    want_d1 = math.log(2.0) * (4.4 / 3.65)
    want_d0 = math.log(2.0) * 1.0
    assert [(r, d) for r, d, _ in top] == [(1, 1), (2, 0)]
    assert top[0][2] == pytest.approx(round(want_d1, 4))
    assert top[1][2] == pytest.approx(round(want_d0, 4))


def test_two_term_or_hand_computed(oracle):
    # "dog bird": d2 has both: idf(dog)*tfpart(1,2) + idf(bird)*tfpart(1,2)
    #   tfpart(1,2) = 1.0  → score = ln2 + ln(10/3)
    # d0 has dog only: ln2 * 1.0
    top = oracle.topk("dog bird", k=4, mode="or")
    assert [(r, d) for r, d, _ in top] == [(1, 2), (2, 0)]
    assert top[0][2] == pytest.approx(
        round(math.log(2.0) + math.log(10.0 / 3.0), 4)
    )


def test_and_mode_requires_all_terms(oracle):
    top = oracle.topk("cat fish", k=4, mode="and")
    assert [d for _, d, _ in top] == [1]  # only d1 has both


def test_spark_engine_matches_hand_corpus(spark, oracle):
    from pyf_aggregator_spark.index.builder import build_index
    from pyf_aggregator_spark.search.engine import bm25_topk

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    index = build_index(docs)
    for q, mode in [("cat", "or"), ("dog bird", "or"), ("cat fish", "and")]:
        golden = oracle.topk(q, k=4, mode=mode)
        got = bm25_topk(index, q, k=4, mode=mode).collect()
        assert [(i + 1, r["doc_id"], r["score"]) for i, r in enumerate(got)] == [
            (r, d, pytest.approx(s)) for r, d, s in golden
        ]
