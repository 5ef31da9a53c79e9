"""Typo-tolerant term lookup — Typesense searches with num_typos=2 BY
DEFAULT, so every reference query surface (db.py:266-290 passes no
num_typos override) is typo-tolerant; a user switching engines would
miss it immediately.

SymSpell-style deletion neighborhood, Spark-native:

- BUILD TIME: from term_stats alone, derive (variant, term, df) where
  variant ranges over the term and its single-character deletions —
  pure JVM column algebra (transform over a sequence + explode), one
  shuffle-free map over the |vocabulary| table (tiny next to postings),
  written once beside the index.
- QUERY TIME: a query term missing from the vocabulary joins the
  deletion table on ITS OWN deletion neighborhood (≤ len+1 variants,
  broadcast), candidates are verified with exact Levenshtein ≤ 1
  (F.levenshtein, JVM) and the most frequent term wins (df desc, term
  asc — Typesense prefers popular corrections). Known terms pass
  through untouched.

Deletion-neighborhood intersection covers exactly the edit-distance-1
operations (insert/delete/substitute); the Levenshtein verify keeps
precision where the variant join over-generates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyf_aggregator_spark.functions.tokenize import tokenize_py

MAX_TERM_LEN = 32  # skip pathological tokens (URLs, hashes)


def _deletion_variants(col: str):
    """column → array of the value + its 1-char deletions (JVM only)."""
    t = F.col(col)
    dels = F.transform(
        F.sequence(F.lit(0), F.length(t) - 1),
        lambda i: F.concat(
            t.substr(F.lit(1), i), t.substr(i + F.lit(2), F.lit(1_000_000))
        ),
    )
    return F.array_distinct(F.concat(F.array(t), dels))


def build_deletion_table(term_stats: DataFrame) -> DataFrame:
    """term_stats(term, df, ...) → (variant, term, df): the build-time
    typo artifact. Size ≈ Σ len(term) rows over the vocabulary — for a
    10^12-turn corpus the vocabulary is millions of terms, so this is
    megabytes where the postings are terabytes."""
    base = term_stats.select("term", "df").filter(
        F.length("term") <= MAX_TERM_LEN
    )
    return base.select(
        F.explode(_deletion_variants("term")).alias("variant"), "term", "df"
    )


def write_deletion_table(term_stats: DataFrame, index_dir: str) -> None:
    build_deletion_table(term_stats).write.mode("overwrite").parquet(
        f"{index_dir}/typo_variants"
    )


def correct_terms(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    term_stats: DataFrame,
) -> dict[str, str | None]:
    """query terms → {term: corrected_term | None}. Known terms map to
    themselves; unknown terms map to their best edit-distance-1
    vocabulary neighbor (max df, tie → lexicographically smallest), or
    None when no neighbor exists (the token contributes nothing, like
    Typesense after typo expansion fails)."""
    terms = sorted(set(terms))
    if not terms:
        return {}
    known = {
        r["term"]
        for r in term_stats.filter(F.col("term").isin(terms))
        .select("term")
        .collect()
    }
    out: dict[str, str | None] = {t: t for t in known}
    unknown = [t for t in terms if t not in known]
    if not unknown:
        return out
    qdf = spark.createDataFrame(
        [(t,) for t in unknown], "qterm string"
    ).select(
        "qterm", F.explode(_deletion_variants("qterm")).alias("variant")
    )
    import os

    if not os.path.exists(f"{index_dir}/typo_variants"):
        # build-on-first-use: the artifact is derivable from term_stats
        # alone, so an index built before the typo layer existed (or by
        # a path that skipped it) self-heals here
        write_deletion_table(term_stats, index_dir)
    dels = spark.read.parquet(f"{index_dir}/typo_variants")
    # the query side is ≤ Σ len(unknown terms) rows → broadcast; the
    # candidate set after the variant equi-join is tiny (the deletion
    # neighborhood of a handful of tokens)
    w = Window.partitionBy("qterm").orderBy(F.desc("df"), F.asc("term"))
    cand = (
        dels.join(F.broadcast(qdf), "variant")
        .filter(F.levenshtein("qterm", "term") <= 1)
        .select("qterm", "term", "df")
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qterm", "term")
    )
    got = {r["qterm"]: r["term"] for r in cand.collect()}
    for t in unknown:
        out[t] = got.get(t)
    return out


def wand_topk_typo(
    idx: dict, query: str, k: int = 10, mode: str = "or"
) -> DataFrame:
    """Typo-tolerant top-k: unknown query terms are corrected to their
    best edit-distance-1 vocabulary neighbor before the WAND pass."""
    from pyf_aggregator_spark.search.wand import wand_topk

    spark = idx["segments"].sparkSession
    mapping = correct_terms(
        spark, idx["dir"], tokenize_py(query), idx["term_stats"]
    )
    corrected = [v for v in mapping.values() if v is not None]
    if not corrected:
        return spark.createDataFrame([], "doc_id long, score double")
    return wand_topk(idx, " ".join(sorted(set(corrected))), k=k, mode=mode)
