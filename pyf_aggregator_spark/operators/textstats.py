"""Text-analysis operators for a training-data pipeline over `documents`.

Language-ID (stopword-vote heuristic), quality scoring (length/punct/
stopword ratios), token counting (tokenizer + whitespace + BPE-ish
regex), and document fingerprinting (md5 + shingle-min rolling hash).
All JVM column algebra — these run per-document at 100 TB scale with
zero Python and zero shuffles (narrow transformations only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyf_aggregator_spark import TOKEN_SEP_RE
from pyf_aggregator_spark.registry import load, register

BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
STOPWORDS = ["the", "a", "of", "and", "to"]
_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)


def _tokens(col):
    return F.filter(
        F.split(F.lower(col), TOKEN_SEP_RE), lambda t: t != F.lit("")
    )


@register(
    "txt_token_count",
    f"""
    SELECT doc_id,
      len(list_filter(string_split_regex(lower(text), '[\\s.\\-_@/]+'), t -> t <> '')) AS n_tok,
      len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS n_ws,
      len(regexp_extract_all(text, '{BPE_RE}')) AS n_bpe
    FROM documents ORDER BY doc_id
    """,
)
def txt_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: engine tokenizer, whitespace split,
    BPE-ish piece regex (letters / digits / single punctuation)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).alias("n_tok"),
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
        ).alias("n_ws"),
        F.regexp_count("text", F.lit(BPE_RE)).alias("n_bpe"),
    ).orderBy("doc_id")


@register(
    "txt_quality_score",
    f"""
    WITH feat AS (
      SELECT doc_id,
        len(list_filter(string_split_regex(lower(text), '[\\s.\\-_@/]+'), t -> t <> ''))::DOUBLE AS n_tok,
        len(list_filter(list_filter(string_split_regex(lower(text), '[\\s.\\-_@/]+'), t -> t <> ''),
                        t -> t IN ({_STOP_IN})))::DOUBLE AS n_stop,
        len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE AS n_punct,
        length(text)::DOUBLE AS n_chars
      FROM documents
    )
    SELECT doc_id,
      round(n_stop / greatest(n_tok, 1), 4) AS stopword_ratio,
      round(n_punct / greatest(n_chars, 1), 4) AS punct_ratio,
      round(least(n_tok / 64.0, 1.0)
            * (1.0 - least(n_punct / greatest(n_chars, 1), 1.0))
            * (0.5 + 0.5 * least(n_stop / greatest(n_tok, 1) * 5.0, 1.0)), 4) AS quality
    FROM feat ORDER BY doc_id
    """,
)
def txt_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristic: length saturation × punctuation cleanliness ×
    stopword-plausibility (natural text has some stopwords)."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks).cast("double")
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(STOPWORDS))
    ).cast("double")
    n_punct = F.regexp_count("text", F.lit(r"[^A-Za-z0-9\s]")).cast("double")
    n_chars = F.length("text").cast("double")
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1.0))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1.0))
    quality = (
        F.least(n_tok / 64.0, F.lit(1.0))
        * (1.0 - F.least(punct_ratio, F.lit(1.0)))
        * (0.5 + 0.5 * F.least(stop_ratio * 5.0, F.lit(1.0)))
    )
    return d.select(
        "doc_id",
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(quality, 4).alias("quality"),
    ).orderBy("doc_id")


_LANG_MARKERS = {
    "en": ["the", "a", "of"],
    "es": ["el", "los", "que"],
    "fr": ["le", "les", "une"],
    "de": ["der", "die", "und"],
}


@register(
    "txt_lang_id",
    """
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(
        string_split_regex(lower(text), '[\\s.\\-_@/]+'), t -> t <> '')) AS t
      FROM documents
    ),
    votes AS (
      SELECT doc_id,
        count(*) FILTER (t IN ('the','a','of'))   AS en_hits,
        count(*) FILTER (t IN ('el','los','que')) AS es_hits,
        count(*) FILTER (t IN ('le','les','une')) AS fr_hits,
        count(*) FILTER (t IN ('der','die','und')) AS de_hits
      FROM tok GROUP BY doc_id
    )
    SELECT d.doc_id, d.lang,
      CASE WHEN greatest(coalesce(en_hits,0), coalesce(es_hits,0),
                         coalesce(fr_hits,0), coalesce(de_hits,0)) = 0 THEN 'unknown'
           WHEN coalesce(en_hits,0) >= greatest(coalesce(es_hits,0), coalesce(fr_hits,0), coalesce(de_hits,0)) THEN 'en'
           WHEN coalesce(es_hits,0) >= greatest(coalesce(fr_hits,0), coalesce(de_hits,0)) THEN 'es'
           WHEN coalesce(fr_hits,0) >= coalesce(de_hits,0) THEN 'fr'
           ELSE 'de' END AS pred_lang
    FROM documents d LEFT JOIN votes USING (doc_id)
    ORDER BY doc_id
    """,
)
def txt_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: marker-token votes with a
    deterministic priority tie-break (en > es > fr > de)."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    def _marker_hits(markers: list[str]):
        # single-arg lambda: a 2-arg lambda would be treated as the
        # (element, index) form of F.filter and compare against indices
        return F.size(F.filter(toks, lambda t: t.isin(markers)))

    hits = {lang: _marker_hits(markers) for lang, markers in _LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    pred = (
        F.when(best == 0, "unknown")
        .when(hits["en"] >= F.greatest(hits["es"], hits["fr"], hits["de"]), "en")
        .when(hits["es"] >= F.greatest(hits["fr"], hits["de"]), "es")
        .when(hits["fr"] >= hits["de"], "fr")
        .otherwise("de")
    )
    return d.select("doc_id", "lang", pred.alias("pred_lang")).orderBy("doc_id")


@register(
    "txt_fingerprint",
    """
    WITH tok AS (
      SELECT doc_id, list_filter(
        string_split_regex(lower(text), '[\\s.\\-_@/]+'), t -> t <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id, min(md5(t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4])) AS shingle_min
      FROM tok, unnest(range(1, greatest(len(t)-3, 1))) u(i)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           md5(lower(trim(d.text))) AS fp_md5,
           ('0x' || substr(md5(lower(trim(d.text))), 1, 8))::BIGINT AS fp64,
           s.shingle_min
    FROM documents d LEFT JOIN sh s USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def txt_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: whole-text md5 (+64-bit prefix) and the
    min-shingle rolling-hash fingerprint (winnowing-style)."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    norm = F.lower(F.trim("text"))
    # 5-gram shingles via transform over an index range, then min(md5);
    # docs with <5 tokens have no shingle (NULL), matching the oracle's
    # empty-range left join.
    # greatest() keeps the sequence ascending for short docs; try_element_at
    # avoids ANSI out-of-bounds on the (discarded) short-doc branch
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 4, F.lit(1))),
        lambda i: F.concat_ws(
            " ",
            F.try_element_at(toks, i),
            F.try_element_at(toks, i + 1),
            F.try_element_at(toks, i + 2),
            F.try_element_at(toks, i + 3),
            F.try_element_at(toks, i + 4),
        ),
    )
    shingle_min = F.when(
        F.size(toks) >= 5,
        F.array_min(F.transform(shingles, lambda s: F.md5(s.cast("binary")))),
    ).otherwise(F.lit(None))
    return d.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("fp_md5"),
        F.conv(F.substring(F.md5(norm.cast("binary")), 1, 8), 16, 10)
        .cast("long")
        .alias("fp64"),
        shingle_min.alias("shingle_min"),
    ).orderBy("doc_id")
