"""Phrase ("exact match") search — Typesense supports quoting a phrase
inside q to require adjacency; the reference's search surface inherits
it. Our segments store no positions, so phrase matching runs as
candidates-then-verify (the same shape as every LSH family here):

  1. candidates = ALL docs containing every phrase term (the AND-mode
     posting intersection — a scan of the query terms' postings only,
     one groupBy shuffle; NOT a top-k, so no true match can be cut off
     by an overfetch heuristic);
  2. verify adjacency with one JVM regex over the candidates' text:
     the phrase terms joined by the tokenizer's separator class, with
     token boundaries at the edges — exactly "these tokens, adjacent,
     in order" under the shared tokenizer contract (db.py:241
     separators);
  3. rank the survivors by their BM25 score (same rounding/tie-break
     as every other query).

Physical plan honesty (audited in tests/test_plans.py): Catalyst
pushes the adjacency regex BELOW the join onto the docs scan — the
verify is one shuffle-free linear pass over the text column the scan
was reading anyway (regex CPU ≈ tokenization CPU), and the regex-
surviving side joins the scored candidates on doc_id (AQE picks
broadcast when the phrase is rare, sort-merge when common). That is
the better 10^12-turn shape than verify-after-join, which would
shuffle the corpus-sized docs side to evaluate the same regex on
fewer rows. The inherent cost of positionless phrase search is this
one corpus-text pass per phrase query; a positional index is the
classic alternative and would change the segment format — runtime
bloom-filter joins (spark.sql.optimizer.runtime.bloomFilter) can
prune the docs scan by candidate doc_id without either.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyf_aggregator_spark.functions.tokenize import tokenize_py
from pyf_aggregator_spark.index.builder import CorpusIndex
from pyf_aggregator_spark.search.engine import SCORE_DECIMALS, _scored

_SEP = r"[\s.\-_@/]"


def phrase_regex(terms: list[str]) -> str:
    """Adjacency pattern under the tokenizer contract: terms in order,
    separated by one-or-more separator chars, bounded by separators or
    string edges. Java (Spark rlike) and RE2 (DuckDB regexp_matches)
    both accept this subset."""
    body = f"{_SEP}+".join(re.escape(t) for t in terms)
    return f"(?i)(^|{_SEP}){body}({_SEP}|$)"


def phrase_topk(
    index: CorpusIndex, phrase: str, k: int = 10
) -> DataFrame:
    """→ DataFrame(doc_id long, score double): top-k docs containing
    the phrase's tokens ADJACENT and IN ORDER, BM25-ranked."""
    terms = tokenize_py(phrase)
    spark = index.docs.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    scored = _scored(index, terms)
    if len(set(terms)) > 1:
        scored = scored.filter(F.col("nmatch") == len(set(terms)))
    pat = phrase_regex(terms)
    docs = index.docs.select("doc_id", "text")
    return (
        scored.join(docs, "doc_id")
        .filter(F.col("text").rlike(pat))
        .select(
            "doc_id", F.round("raw_score", SCORE_DECIMALS).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def phrase_oracle_sql(phrase: str, k: int = 10) -> str:
    """DuckDB twin for tests: AND-mode BM25 over the full match set,
    post-filtered by the same adjacency regex."""
    from pyf_aggregator_spark.oracle import sql as osql

    terms = tokenize_py(phrase)
    inner = osql.bm25_topk_sql(phrase, 10_000_000, "and").strip()
    pat = phrase_regex(terms).replace("'", "''")
    return f"""
    WITH scored AS ({inner})
    SELECT s.doc_id, s.score
    FROM scored s JOIN documents d USING (doc_id)
    WHERE regexp_matches(d.text, '{pat}')
    ORDER BY s.score DESC, s.doc_id ASC
    LIMIT {k}
    """
