"""The unified search endpoint — the reference talks to ONE API,
``collection.documents.search(params)`` (db.py:266-290,
cli_utils.py:147-155 compose the param dicts); everything else in this
package is the engine underneath. This facade accepts the Typesense
param names the reference uses (plus the engine defaults Typesense
applies silently) and returns a Typesense-shaped response dict:

    q                    query string; "*" = match-all
    filter_by            "field:=value" / "field:=[v1,v2]", joined by &&
    facet_by             comma list of facet fields
    sort_by              "field:desc|asc" (match-all path; ranked
                         queries sort by text_match like Typesense)
    page / per_page      1-based pagination (defaults 1 / 10)
    group_by/group_limit grouped results
    num_typos            0 disables typo correction (default 1 here)
    prefix               last-token autocomplete (default False here;
                         Typesense defaults true)
    drop_tokens_threshold retry with dropped tokens when hits < N
    highlight            attach <mark> highlights + snippets

Response: {"found", "page", "hits": [{"document", "text_match"}],
"facet_counts": [{"field_name", "counts": [{"value", "count"}]}],
"grouped_hits" when group_by}.

Every component keeps its scale path: the filter rides into the WAND
kernel as an allow-set, facets aggregate the term-pruned match set
(never the corpus), hydration joins the k-row page only.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyf_aggregator_spark.functions.tokenize import tokenize_py


def parse_filter_by(filter_by: str | None):
    """'lang:=en && n_chars:=[100,200]' → list of (field, [values])."""
    if not filter_by:
        return []
    out = []
    for clause in filter_by.split("&&"):
        clause = clause.strip()
        m = re.match(r"^(\w+)\s*:=\s*(.+)$", clause)
        if not m:
            raise ValueError(f"unsupported filter_by clause: {clause!r}")
        field, val = m.group(1), m.group(2).strip()
        if val.startswith("[") and val.endswith("]"):
            vals = [v.strip() for v in val[1:-1].split(",") if v.strip()]
        else:
            vals = [val]
        out.append((field, vals))
    return out


def _apply_filters(docs: DataFrame, clauses) -> DataFrame:
    for field, vals in clauses:
        col = F.col(field).cast("string")
        docs = docs.filter(col.isin(vals))
    return docs


def search(spark: SparkSession, sf_dir: str, params: dict) -> dict:
    """One-call search over the driver's documents table, composed from
    the engine's scale paths (segment/WAND engine, kernel-pushed
    filters, hit-set facets)."""
    from pyf_aggregator_spark.operators.fulltext_extra import (
        documents_segment_index,
        grouped_search,
    )
    from pyf_aggregator_spark.registry import documents_index, load
    from pyf_aggregator_spark.search.engine import _scored
    from pyf_aggregator_spark.search.fallback import wand_topk_drop_tokens
    from pyf_aggregator_spark.search.prefix import expand_prefix
    from pyf_aggregator_spark.search.typo import correct_terms
    from pyf_aggregator_spark.search.wand import wand_topk

    q = params.get("q", "*")
    page = int(params.get("page", 1))
    per_page = int(params.get("per_page", 10))
    clauses = parse_filter_by(params.get("filter_by"))
    docs = load(spark, sf_dir, "documents")
    filtered_docs = _apply_filters(docs, clauses)

    # ---------------- match-all: filter + sort + page, no scoring
    if q == "*" or not tokenize_py(q):
        out = filtered_docs
        sort_by = params.get("sort_by")
        if sort_by:
            field, _, direction = sort_by.partition(":")
            order = (
                F.desc(field) if direction.strip() == "desc" else F.asc(field)
            )
            out = out.orderBy(order, F.asc("doc_id"))
        else:
            out = out.orderBy(F.asc("doc_id"))
        found = out.count()
        rows = out.limit(page * per_page).collect()[(page - 1) * per_page :]
        return {
            "found": found,
            "page": page,
            "hits": [{"document": r.asDict(), "text_match": None} for r in rows],
            "facet_counts": _facets(
                params.get("facet_by"), filtered_docs.select("*")
            ),
        }

    # ---------------- ranked search
    idx = documents_segment_index(spark, sf_dir)
    terms = tokenize_py(q)
    if int(params.get("num_typos", 1)) > 0:
        mapping = correct_terms(spark, idx["dir"], terms, idx["term_stats"])
        terms = [mapping.get(t) or t for t in terms]
    if params.get("prefix") and terms:
        *fixed, last = terms
        terms = sorted(
            set(fixed) | set(expand_prefix(idx["term_stats"], last) or [last])
        )
    query = " ".join(terms)
    mode = params.get("mode", "or")
    allowed = (
        filtered_docs.select("doc_id") if clauses else None
    )

    group_by = params.get("group_by")
    if group_by:
        limit = int(params.get("group_limit", 1))
        grouped = grouped_search(
            spark, sf_dir, query, group_by, group_limit=limit
        ).collect()
        return {
            "found": len(grouped),
            "page": page,
            "grouped_hits": [r.asDict() for r in grouped],
        }

    k = page * per_page
    drop_threshold = int(params.get("drop_tokens_threshold", 0))
    if drop_threshold and mode == "and":
        hits_df, used_terms = wand_topk_drop_tokens(
            idx, query, k=k, mode=mode, threshold=drop_threshold,
            allowed=allowed,
        )
        query = " ".join(used_terms)
    else:
        hits_df = wand_topk(idx, query, k=k, mode=mode, allowed=allowed)
    rows = hits_df.collect()[(page - 1) * per_page :]

    # found = size of the full (filtered) match set, like Typesense
    scored = _scored(documents_index(spark, sf_dir), tokenize_py(query))
    if mode == "and":
        scored = scored.filter(F.col("nmatch") == len(set(tokenize_py(query))))
    match_set = scored.select("doc_id")
    if clauses:
        match_set = match_set.join(filtered_docs.select("doc_id"), "doc_id")
    found = match_set.count()

    hit_ids = spark.createDataFrame(
        [(r["doc_id"], r["score"]) for r in rows], "doc_id long, score double"
    ) if rows else spark.createDataFrame([], "doc_id long, score double")
    hydrate = F.broadcast(hit_ids).join(docs, "doc_id")
    if params.get("highlight"):
        from pyf_aggregator_spark.search.highlight import (
            highlight_col,
            snippet_col,
        )

        hydrate = hydrate.withColumn(
            "highlight", highlight_col(F.col("text"), terms)
        ).withColumn("snippet", snippet_col(F.col("text"), terms))
    hydrated = {r["doc_id"]: r.asDict() for r in hydrate.collect()}
    hits = []
    for r in rows:
        d = dict(hydrated.get(r["doc_id"], {"doc_id": r["doc_id"]}))
        d.pop("score", None)
        hits.append({"document": d, "text_match": r["score"]})
    return {
        "found": found,
        "page": page,
        "hits": hits,
        "facet_counts": _facets(
            params.get("facet_by"),
            docs.join(match_set, "doc_id"),
        ),
    }


def _facets(facet_by: str | None, hit_docs: DataFrame) -> list[dict]:
    if not facet_by:
        return []
    out = []
    for field in [f.strip() for f in facet_by.split(",") if f.strip()]:
        counts = (
            hit_docs.groupBy(field)
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc(field))
            .collect()
        )
        out.append(
            {
                "field_name": field,
                "counts": [
                    {"value": r[field], "count": r["n"]} for r in counts
                ],
            }
        )
    return out
