"""The reference's four real consumption patterns of the search
endpoint, replayed verbatim against the facade — these are the loops a
pyf.aggregator user actually runs, so their exact param combinations
and response-shape reads are the parity contract:

- ``get_unique_package_names`` (db.py:266-290): q="*" + group_by +
  group_limit=1 + include_fields, paged by GROUPS, terminating on
  ``len(result["grouped_hits"]) < per_page``, reading
  ``group["hits"][*]["document"]["name"]``.
- the enricher walk (downloads.py:40-75, health_calculator.py:40-65,
  github.py:150-192): q="*" + group_by=name_sortable + group_limit=1,
  reading ``results["request_params"]["per_page"]`` and ``found`` to
  derive the page range, then the same nested grouped_hits walk.
- ``get_package_document_ids`` (db.py:318-345): q="*" + filter_by +
  include_fields, paged flat hits, terminating on ``not hits`` /
  ``len(hits) < per_page``.
- ``get_documents_by_name`` (db.py:403-426): ranked q + query_by +
  filter_by + sort_by, reading ``hit["document"]`` off one page.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyf_aggregator_spark.registry import load
from pyf_aggregator_spark.search.api import search

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sf_dir():
    return SF


def test_unique_names_walk(spark, sf_dir):
    """db.py:266-290 verbatim: collect every distinct group value via
    the grouped match-all walk; the loop's termination condition and
    document reads must work unchanged."""
    unique, page, per_page = set(), 1, 7
    while True:
        result = search(spark, sf_dir, {
            "q": "*",
            "query_by": "name",         # passed by the reference; q="*"
            "include_fields": "source",  # ignores it, as Typesense does
            "per_page": per_page,
            "page": page,
            "group_by": "source",
            "group_limit": 1,
        })
        for group in result.get("grouped_hits", []):
            for hit in group.get("hits", []):
                name = hit.get("document", {}).get("source")
                if name:
                    unique.add(name)
        if len(result.get("grouped_hits", [])) < per_page:
            break
        page += 1
    docs = load(spark, sf_dir, "documents")
    want = {
        r["source"]
        for r in docs.select("source").distinct().collect()
        if r["source"]
    }
    assert unique == want
    # include_fields pruned the document to exactly the requested field
    assert set(hit["document"].keys()) == {"source"}


def test_unique_names_walk_filtered(spark, sf_dir):
    """The registry-scoped variant: filter_by rides into the grouped
    match-all walk (db.py:276-277)."""
    result = search(spark, sf_dir, {
        "q": "*", "filter_by": "lang:=en", "per_page": 250,
        "group_by": "source", "group_limit": 1,
    })
    docs = load(spark, sf_dir, "documents")
    en = docs.filter(F.col("lang") == "en")
    assert result["found"] == en.count()
    assert result["found_groups"] == en.select("source").distinct().count()
    got = {g["group_key"][0] for g in result["grouped_hits"]}
    assert got == {r["source"] for r in en.select("source").distinct().collect()}
    # per-group found = that group's doc count under the filter
    per_group = {
        r["source"]: r["n"]
        for r in en.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for g in result["grouped_hits"]:
        assert g["found"] == per_group[g["group_key"][0]]


def test_enricher_walk_request_params(spark, sf_dir):
    """downloads.py:40-75: the enricher derives its page range from
    ``request_params.per_page`` + ``found``, then walks the nested
    grouped_hits shape. Every document must be visitable exactly once
    at group_limit=1 per distinct group."""
    search_parameters = {
        "q": "*", "group_by": "source", "group_limit": 1, "per_page": 6,
    }
    results = search(spark, sf_dir, search_parameters)
    per_page = results["request_params"]["per_page"]
    assert per_page == 6
    found = results["found"]
    docs = load(spark, sf_dir, "documents")
    assert found == docs.count()

    seen = []
    page = 0
    for _ in range(0, found, per_page):
        page += 1
        results = search(spark, sf_dir, dict(search_parameters, page=page))
        if not results["grouped_hits"]:
            break
        for group in results["grouped_hits"]:
            for item in group["hits"]:
                data = item["document"]
                assert "source" in data and "text" in data  # full doc
                seen.append(data["source"])
    assert len(seen) == len(set(seen))  # each group visited once
    assert len(seen) == docs.select("source").distinct().count()


def test_get_package_document_ids_walk(spark, sf_dir):
    """db.py:318-345: q="*" + filter_by + include_fields, flat hits
    paged until exhaustion."""
    ids, page, per_page = [], 1, 9
    while True:
        result = search(spark, sf_dir, {
            "q": "*",
            "filter_by": "lang:=de",
            "include_fields": "doc_id,lang",
            "per_page": per_page,
            "page": page,
        })
        hits = result.get("hits", [])
        if not hits:
            break
        for hit in hits:
            document = hit.get("document", {})
            assert document.get("lang") == "de"
            ids.append(document["doc_id"])
        if len(hits) < per_page:
            break
        page += 1
    docs = load(spark, sf_dir, "documents")
    want = [
        r["doc_id"]
        for r in docs.filter(F.col("lang") == "de")
        .orderBy("doc_id").collect()
    ]
    assert ids == want and len(ids) > 0


def test_matchall_grouped_sort_by(spark, sf_dir):
    """group_by + sort_by compose on the match-all walk: hits within a
    group follow the sort order, groups ordered by their best hit."""
    res = search(spark, sf_dir, {
        "q": "*", "group_by": "lang", "group_limit": 3,
        "sort_by": "n_chars:desc", "per_page": 50,
    })
    docs = load(spark, sf_dir, "documents")
    assert res["found_groups"] == docs.select("lang").distinct().count()
    firsts = []
    for g in res["grouped_hits"]:
        chars = [h["document"]["n_chars"] for h in g["hits"]]
        assert chars == sorted(chars, reverse=True)
        # match-all carries no score
        assert all(h["text_match"] is None for h in g["hits"])
        firsts.append(chars[0])
    assert firsts == sorted(firsts, reverse=True)
    # per-group hits are the group's ACTUAL top-3 by the sort field
    top = res["grouped_hits"][0]
    gv = top["group_key"][0]
    want = [
        r["n_chars"]
        for r in docs.filter(F.col("lang") == gv)
        .orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(3).collect()
    ]
    assert [h["document"]["n_chars"] for h in top["hits"]] == want


def test_ranked_sort_by_group_by_raises(spark, sf_dir):
    """sort_by + group_by on a RANKED query is an explicit error (the
    facade never silently drops a param)."""
    with pytest.raises(ValueError, match="match-all"):
        search(spark, sf_dir, {
            "q": "spark", "group_by": "lang", "sort_by": "n_chars:desc",
        })


def test_get_documents_by_name_walk(spark, sf_dir):
    """db.py:403-426: ranked q + query_by + filter_by + sort_by,
    documents read straight off the hits page."""
    docs = load(spark, sf_dir, "documents")
    name = docs.select("source").first()["source"]
    result = search(spark, sf_dir, {
        "q": name,
        "query_by": "name",
        "filter_by": f"source:={name}",
        "sort_by": "n_chars:desc",
        "per_page": 100,
        "num_typos": 0,
    })
    documents = [hit["document"] for hit in result.get("hits", [])]
    want = docs.filter(F.col("source") == name)
    assert result["found"] == want.count() > 0
    chars = [d["n_chars"] for d in documents]
    assert chars == sorted(chars, reverse=True)
    assert {d["source"] for d in documents} == {name}
