"""Typo-tolerant term lookup — Typesense searches with num_typos=2 BY
DEFAULT, so every reference query surface (db.py:266-290 passes no
num_typos override) is typo-tolerant to TWO edits; a user switching
engines would miss it immediately. Typesense's length gates apply:
tokens shorter than ``min_len_1typo``=4 match exactly, tokens shorter
than ``min_len_2typo``=7 get at most one edit.

SymSpell-style deletion neighborhood (Garbe's algorithm: two strings
are within edit distance d iff their depth-d deletion neighborhoods
intersect), Spark-native:

- BUILD TIME: from term_stats alone, derive (variant, term, df) where
  variant ranges over the term, its single-character deletions, and —
  for terms long enough to ever be a distance-2 match (len ≥ 5) — its
  two-character deletions. Pure JVM column algebra (transform over a
  sequence + flatten + explode), one shuffle-free map over the
  |vocabulary| table (tiny next to postings), written once beside the
  index.
- QUERY TIME: a query term missing from the vocabulary joins the
  deletion table on ITS OWN deletion neighborhood (depth gated by the
  same length rules, broadcast), candidates are verified with exact
  Levenshtein ≤ allowed (F.levenshtein, JVM), and the winner is the
  LOWEST edit distance first (Typesense tries distance 1 before 2),
  then highest df (popular corrections preferred), then term asc.
  Known terms pass through untouched.

The Levenshtein verify keeps precision where the variant join
over-generates; the depth/length gates keep the artifact at
O(Σ len²/2) rows over the vocabulary — megabytes where postings are
terabytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyf_aggregator_spark.functions.tokenize import tokenize_py

MAX_TERM_LEN = 32  # skip pathological tokens (URLs, hashes)
MIN_LEN_1TYPO = 4  # Typesense default: shorter tokens match exactly
MIN_LEN_2TYPO = 7  # Typesense default: shorter tokens get ≤ 1 edit

# artifact dir; versioned because pre-r4 indexes hold a depth-1 table
TYPO_DIR = "typo_variants_d2"


def _del1(t: Column) -> Column:
    """string column → array of its 1-char deletions (JVM only)."""
    return F.transform(
        F.sequence(F.lit(0), F.length(t) - 1),
        lambda i: F.concat(
            t.substr(F.lit(1), i), t.substr(i + F.lit(2), F.lit(1_000_000))
        ),
    )


def _deletion_variants(col: str, max_depth_col: Column) -> Column:
    """column → distinct array of the value + its deletions up to
    ``max_depth_col`` (0, 1, or 2) — the SymSpell neighborhood."""
    t = F.col(col)
    d1 = _del1(t)
    d2 = F.array_distinct(F.flatten(F.transform(d1, _del1)))
    empty = F.array().cast("array<string>")
    return F.array_distinct(
        F.concat(
            F.array(t),
            F.when(max_depth_col >= 1, d1).otherwise(empty),
            F.when(max_depth_col >= 2, d2).otherwise(empty),
        )
    )


def _allowed_typos(length: Column) -> Column:
    """Typesense's per-token edit budget from its length gates."""
    return (
        F.when(length >= MIN_LEN_2TYPO, F.lit(2))
        .when(length >= MIN_LEN_1TYPO, F.lit(1))
        .otherwise(F.lit(0))
    )


def build_deletion_table(term_stats: DataFrame) -> DataFrame:
    """term_stats(term, df, ...) → (variant, term, df): the build-time
    typo artifact. Depth 2 is generated only for terms of len ≥ 5 (a
    distance-2 match of a ≥7-char query token is at least that long),
    depth 1 for len ≥ 3 — both sides of the SymSpell intersection are
    gated by the same length rules, so no recall is lost."""
    base = term_stats.select("term", "df").filter(
        F.length("term") <= MAX_TERM_LEN
    )
    depth = (
        F.when(F.length("term") >= MIN_LEN_2TYPO - 2, F.lit(2))
        .when(F.length("term") >= MIN_LEN_1TYPO - 1, F.lit(1))
        .otherwise(F.lit(0))
    )
    return base.select(
        F.explode(_deletion_variants("term", depth)).alias("variant"),
        "term",
        "df",
    )


def write_deletion_table(term_stats: DataFrame, index_dir: str) -> None:
    """Staged write + rename: a crashed build leaves only the .staged
    dir (cleaned on the next attempt), so an EXISTING artifact dir is
    always a complete one — the build-on-first-use existence check in
    correct_terms can trust it."""
    import os
    import shutil

    staged = f"{index_dir}/{TYPO_DIR}.staged"
    final = f"{index_dir}/{TYPO_DIR}"
    shutil.rmtree(staged, ignore_errors=True)
    build_deletion_table(term_stats).write.mode("overwrite").parquet(staged)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(staged, final)


def correct_terms(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    term_stats: DataFrame,
    num_typos: int = 2,
    known_terms: set[str] | None = None,
) -> dict[str, str | None]:
    """query terms → {term: corrected_term | None}. Known terms map to
    themselves; unknown terms map to their best vocabulary neighbor
    within min(num_typos, length budget) edits (lowest distance, then
    max df, tie → lexicographically smallest), or None when no neighbor
    exists (the token contributes nothing, like Typesense after typo
    expansion fails).

    ``known_terms``: vocabulary membership already resolved by the
    caller (the in-RAM term dictionary, wand._known_terms) — skips this
    function's membership scan, so an all-known query costs ZERO Spark
    jobs and a typo'd one costs only the deletion-neighborhood join."""
    terms = sorted(set(terms))
    if not terms:
        return {}
    if known_terms is not None:
        known = {t for t in terms if t in known_terms}
    else:
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
    budget = F.least(_allowed_typos(F.length("qterm")), F.lit(num_typos))
    qdf = spark.createDataFrame(
        [(t,) for t in unknown], "qterm string"
    ).select(
        "qterm",
        F.explode(_deletion_variants("qterm", budget)).alias("variant"),
    )
    import os

    if not os.path.exists(f"{index_dir}/{TYPO_DIR}"):
        # build-on-first-use: the artifact is derivable from term_stats
        # alone, so an index built before the typo layer existed (or
        # whose artifact predates the depth-2 upgrade, or a path that
        # skipped it) self-heals here. The build runs under the
        # BLOCKING commit lock so it can't interleave with an upsert's
        # term_stats swap + invalidation (a stale builder finishing
        # after the rmtree would otherwise pin pre-upsert vocabulary
        # until the next swap); the re-check under the lock also stops
        # two concurrent readers from racing overwrites into one path.
        try:
            from pyf_aggregator_spark.index.incremental import _commit_lock

            with _commit_lock(index_dir):
                if not os.path.exists(f"{index_dir}/{TYPO_DIR}"):
                    write_deletion_table(term_stats, index_dir)
        except OSError:
            # index_dir not lockable (read-only fixture dir): fall back
            # to the unlocked build — single-process test shape
            write_deletion_table(term_stats, index_dir)
    dels = spark.read.parquet(f"{index_dir}/{TYPO_DIR}")
    # the query side is ≤ Σ len(unknown terms)²/2 rows → broadcast; the
    # candidate set after the variant equi-join is tiny (the deletion
    # neighborhood of a handful of tokens)
    lev = F.levenshtein("qterm", "term")
    w = Window.partitionBy("qterm").orderBy(
        F.asc("lev"), F.desc("df"), F.asc("term")
    )
    cand = (
        dels.join(F.broadcast(qdf), "variant")
        .filter(
            F.levenshtein("qterm", "term")
            <= F.least(_allowed_typos(F.length("qterm")), F.lit(num_typos))
        )
        .select("qterm", "term", "df", lev.alias("lev"))
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
    idx: dict, query: str, k: int = 10, mode: str = "or",
    num_typos: int = 2,
) -> DataFrame:
    """Typo-tolerant top-k: unknown query terms are corrected to their
    best ≤num_typos-edit vocabulary neighbor before the WAND pass."""
    from pyf_aggregator_spark.search.wand import _known_terms, wand_topk

    spark = idx["segments"].sparkSession
    toks = tokenize_py(query)
    mapping = correct_terms(
        spark, idx["dir"], toks, idx["term_stats"],
        num_typos=num_typos, known_terms=_known_terms(idx, toks),
    )
    corrected = [v for v in mapping.values() if v is not None]
    if not corrected:
        return spark.createDataFrame([], "doc_id long, score double")
    return wand_topk(idx, " ".join(sorted(set(corrected))), k=k, mode=mode)
