"""The unified search endpoint (Typesense-shaped params/response) —
every composition must agree with its directly-invoked engine parts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyf_aggregator_spark.search.api import parse_filter_by, search


def test_parse_filter_by():
    assert parse_filter_by(None) == []
    assert parse_filter_by("lang:=en") == [("lang", ["en"])]
    assert parse_filter_by("lang:=[en, de] && source:=src1") == [
        ("lang", ["en", "de"]),
        ("source", ["src1"]),
    ]
    with pytest.raises(ValueError):
        parse_filter_by("lang>5")


def test_search_ranked_matches_wand(spark, sf_dir):
    from pyf_aggregator_spark.operators.fulltext_extra import (
        documents_segment_index,
    )
    from pyf_aggregator_spark.search.wand import wand_topk

    res = search(spark, sf_dir, {"q": "spark vector", "per_page": 10,
                                 "num_typos": 0})
    direct = wand_topk(
        documents_segment_index(spark, sf_dir), "spark vector", k=10
    ).collect()
    assert [
        (h["document"]["doc_id"], h["text_match"]) for h in res["hits"]
    ] == [(r["doc_id"], r["score"]) for r in direct]
    assert res["found"] >= len(res["hits"]) > 0


def test_search_page2_offsets(spark, sf_dir):
    p1 = search(spark, sf_dir, {"q": "spark vector", "per_page": 5,
                                "num_typos": 0})
    p2 = search(spark, sf_dir, {"q": "spark vector", "per_page": 5,
                                "page": 2, "num_typos": 0})
    ids1 = [h["document"]["doc_id"] for h in p1["hits"]]
    ids2 = [h["document"]["doc_id"] for h in p2["hits"]]
    assert len(ids1) == len(ids2) == 5 and not set(ids1) & set(ids2)


def test_search_filter_and_facets(spark, sf_dir):
    res = search(
        spark, sf_dir,
        {"q": "spark vector", "filter_by": "lang:=en",
         "facet_by": "lang", "per_page": 15, "num_typos": 0},
    )
    assert all(h["document"]["lang"] == "en" for h in res["hits"])
    # facet counts describe the (filtered) match set, and their sum is
    # exactly `found` — the Typesense facet contract
    fc = {c["value"]: c["count"] for c in res["facet_counts"][0]["counts"]}
    assert set(fc) == {"en"}
    assert sum(fc.values()) == res["found"]


def test_search_match_all_sort_and_page(spark, sf_dir):
    from pyf_aggregator_spark.registry import load

    res = search(
        spark, sf_dir,
        {"q": "*", "filter_by": "lang:=en", "sort_by": "n_chars:desc",
         "per_page": 5},
    )
    docs = load(spark, sf_dir, "documents")
    want = (
        docs.filter(F.col("lang") == "en")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(5)
        .collect()
    )
    assert [h["document"]["doc_id"] for h in res["hits"]] == [
        r["doc_id"] for r in want
    ]
    assert res["found"] == docs.filter(F.col("lang") == "en").count()


def test_search_typo_highlight_and_grouped(spark, sf_dir):
    # typo: "spak" corrects to a real term and returns hits
    res = search(spark, sf_dir, {"q": "spak vector", "per_page": 5,
                                 "highlight": True})
    assert len(res["hits"]) == 5
    assert "<mark>" in res["hits"][0]["document"]["highlight"]
    # grouped
    g = search(
        spark, sf_dir,
        {"q": "spark vector window", "group_by": "lang", "group_limit": 2},
    )
    assert g["grouped_hits"] and all(
        r["rank_in_group"] <= 2 for r in g["grouped_hits"]
    )
