"""Prefix (autocomplete) search — Typesense treats the LAST query
token as a prefix by default (`prefix=true`), so "plone.ap" already
matches plone.api in every reference query path.

Spark-native: the last token expands against the vocabulary
(term_stats — a startswith filter the scan can push down), capped at
``max_expansions`` by document frequency (popular completions first,
Typesense's behavior), and the expanded OR query runs through the
normal WAND pass. The vocabulary is millions of rows where the corpus
is 10^12 — the expansion lookup is noise next to the search itself.

Scoring note: the expanded terms all contribute (BM25 OR over the
expansion set); Typesense scores the single matched completion.
Ranking by total evidence for the prefix is a documented, deterministic
choice — completions of the prefix ARE matches of the query intent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyf_aggregator_spark.functions.tokenize import tokenize_py

MAX_EXPANSIONS = 50


def expand_prefix(
    term_stats: DataFrame, prefix: str, max_expansions: int = MAX_EXPANSIONS
) -> list[str]:
    """prefix → up to max_expansions vocabulary terms starting with it,
    most frequent first (ties: lexicographic)."""
    rows = (
        term_stats.filter(F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansions)
        .select("term")
        .collect()
    )
    return [r["term"] for r in rows]


def wand_topk_prefix(
    idx: dict, query: str, k: int = 10, max_expansions: int = MAX_EXPANSIONS
) -> DataFrame:
    """Autocomplete-style top-k: the last token is treated as a prefix
    and expanded against the vocabulary; fixed tokens stay exact."""
    from pyf_aggregator_spark.search.wand import wand_topk

    spark = idx["segments"].sparkSession
    terms = tokenize_py(query)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    *fixed, last = terms
    expansions = expand_prefix(idx["term_stats"], last, max_expansions)
    all_terms = sorted(set(fixed) | set(expansions))
    if not all_terms:
        return spark.createDataFrame([], "doc_id long, score double")
    return wand_topk(idx, " ".join(all_terms), k=k, mode="or")
