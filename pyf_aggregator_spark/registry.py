"""Query registry backing ``__spark_entry__.py``.

Each entry: name → (spark_callable(spark, sf_dir) -> DataFrame,
oracle_sql | None). Oracle SQL runs in DuckDB over views named after the
driver tables. Column names/aliases match between the two sides — the
driver's compare hashes values under sorted column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyf_aggregator_spark.index.builder import CorpusIndex, build_index
from pyf_aggregator_spark.oracle import sql as osql
from pyf_aggregator_spark.search.engine import bm25_topk

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn
    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# One index per (session, sf_dir), cached — queries share the build.
_INDEX_CACHE: dict[tuple[int, str], CorpusIndex] = {}


def documents_index(spark: SparkSession, sf_dir: str) -> CorpusIndex:
    key = (id(spark), sf_dir)
    if key not in _INDEX_CACHE:
        docs = load(spark, sf_dir, "documents")
        _INDEX_CACHE[key] = build_index(docs).cache()
    return _INDEX_CACHE[key]


# ---------------------------------------------------------------- full-text
# The engine core (SURVEY §2.8, U4, W5, A6): BM25 top-k over `documents`.

_BM25_CASES = {
    "ft_bm25_or_two_terms": ("spark vector", 20, "or"),
    "ft_bm25_and_three_terms": ("spark vector window", 20, "and"),
    "ft_bm25_single_rare": ("dup", 20, "or"),
    "ft_bm25_hot_and_rare": ("dup batch", 10, "and"),
    "ft_bm25_separator_query": ("spark.vector-window", 15, "or"),
    "ft_bm25_zero_hit": ("nosuchtermanywhere", 10, "or"),
}

for _name, (_q, _k, _mode) in _BM25_CASES.items():
    def _mk(q=_q, k=_k, mode=_mode):
        def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            return bm25_topk(documents_index(spark, sf_dir), q, k=k, mode=mode)
        return fn
    register(_name, osql.bm25_topk_sql(_q, _k, _mode))(_mk())


@register("ft_term_stats", osql.term_stats_sql())
def ft_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: per-term document frequency + collection frequency."""
    return documents_index(spark, sf_dir).term_stats.orderBy("term")


@register("ft_doc_stats", osql.doc_stats_sql())
def ft_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 analog: doc_len per document (BM25 length normalization)."""
    return documents_index(spark, sf_dir).doc_stats.orderBy("doc_id")


@register("ft_corpus_stats", osql.corpus_stats_sql())
def ft_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return documents_index(spark, sf_dir).corpus.select(
        "n_docs", "total_len", F.round("avgdl", 6).alias("avgdl")
    )


def _register_operator_modules() -> None:
    """Import operator modules for their @register side effects.

    Called at the bottom of this module (after REGISTRY/register/load
    exist) to avoid circular imports."""
    import pyf_aggregator_spark.operators.dedup  # noqa: F401
    import pyf_aggregator_spark.operators.description_queries  # noqa: F401
    import pyf_aggregator_spark.operators.fulltext_extra  # noqa: F401
    import pyf_aggregator_spark.operators.json_queries  # noqa: F401
    import pyf_aggregator_spark.operators.multimodal  # noqa: F401
    import pyf_aggregator_spark.operators.relational  # noqa: F401
    import pyf_aggregator_spark.operators.similarity  # noqa: F401
    import pyf_aggregator_spark.operators.skew  # noqa: F401
    import pyf_aggregator_spark.operators.streaming_queries  # noqa: F401
    import pyf_aggregator_spark.operators.textstats  # noqa: F401
    import pyf_aggregator_spark.operators.transforms_queries  # noqa: F401


@register(
    "ft_match_all_filter_sort",
    """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE lang = 'en'
    ORDER BY n_chars DESC, doc_id ASC LIMIT 25
    """,
)
def ft_match_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q='*' match-all: no scoring, plain filter + sort + page (W3/F3)."""
    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "lang", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(25)
    )


_register_operator_modules()
