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


_TOKENQ_SQL = f"""
    WITH feat AS (
      SELECT doc_id,
        len(list_filter(string_split_regex(lower(text), '[\\s.\\-_@/]+'), t -> t <> '')) AS n_tok,
        len(list_filter(list_filter(string_split_regex(lower(text), '[\\s.\\-_@/]+'), t -> t <> ''),
                        t -> t IN ({_STOP_IN}))) AS n_stop,
        len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS n_ws,
        len(regexp_extract_all(text, '{BPE_RE}')) AS n_bpe,
        len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
        length(text) AS n_chars
      FROM documents
    )
    SELECT doc_id, n_tok, n_ws, n_bpe,
      round(n_stop::DOUBLE / greatest(n_tok, 1), 4) AS stopword_ratio,
      round(n_punct::DOUBLE / greatest(n_chars, 1), 4) AS punct_ratio,
      round(least(n_tok / 64.0, 1.0)
            * (1.0 - least(n_punct::DOUBLE / greatest(n_chars, 1), 1.0))
            * (0.5 + 0.5 * least(n_stop::DOUBLE / greatest(n_tok, 1) * 5.0, 1.0)), 4) AS quality
    FROM feat
    """


def txt_token_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways (engine tokenizer, whitespace split,
    BPE-ish piece regex) + the quality heuristic (length saturation ×
    punctuation cleanliness × stopword plausibility) in one projection —
    narrow column algebra, zero shuffles."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("double")
    n_punct = F.regexp_count("text", F.lit(r"[^A-Za-z0-9\s]")).cast("double")
    n_chars = F.length("text").cast("double")
    stop_ratio = n_stop / F.greatest(n_tok.cast("double"), F.lit(1.0))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1.0))
    quality = (
        F.least(n_tok / 64.0, F.lit(1.0))
        * (1.0 - F.least(punct_ratio, F.lit(1.0)))
        * (0.5 + 0.5 * F.least(stop_ratio * 5.0, F.lit(1.0)))
    )
    return d.select(
        "doc_id",
        n_tok.alias("n_tok"),
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
        ).alias("n_ws"),
        F.regexp_count("text", F.lit(BPE_RE)).alias("n_bpe"),
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


_LANGF_SQL = """
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
    ),
    sh AS (
      SELECT doc_id, min(md5(t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4])) AS shingle_min
      FROM (SELECT doc_id, list_filter(
              string_split_regex(lower(text), '[\\s.\\-_@/]+'), t -> t <> '') AS t
            FROM documents) tl,
           unnest(range(1, greatest(len(t)-3, 1))) u(i)
      GROUP BY doc_id
    )
    SELECT d.doc_id, d.lang,
      CASE WHEN greatest(coalesce(en_hits,0), coalesce(es_hits,0),
                         coalesce(fr_hits,0), coalesce(de_hits,0)) = 0 THEN 'unknown'
           WHEN coalesce(en_hits,0) >= greatest(coalesce(es_hits,0), coalesce(fr_hits,0), coalesce(de_hits,0)) THEN 'en'
           WHEN coalesce(es_hits,0) >= greatest(coalesce(fr_hits,0), coalesce(de_hits,0)) THEN 'es'
           WHEN coalesce(fr_hits,0) >= coalesce(de_hits,0) THEN 'fr'
           ELSE 'de' END AS pred_lang,
      md5(lower(trim(d.text))) AS fp_md5,
      ('0x' || substr(md5(lower(trim(d.text))), 1, 8))::BIGINT AS fp64,
      s.shingle_min
    FROM documents d LEFT JOIN votes USING (doc_id) LEFT JOIN sh s USING (doc_id)
    """


def txt_lang_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (marker-token votes, deterministic en > es
    > fr > de tie-break) + document fingerprints (whole-text md5,
    64-bit prefix, min-shingle winnowing hash) in one projection."""
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
    norm = F.lower(F.trim("text"))
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
        "lang",
        pred.alias("pred_lang"),
        F.md5(norm.cast("binary")).alias("fp_md5"),
        F.conv(F.substring(F.md5(norm.cast("binary")), 1, 8), 16, 10)
        .cast("long")
        .alias("fp64"),
        shingle_min.alias("shingle_min"),
    ).orderBy("doc_id")



@register(
    "txt_analysis",
    f"""
    WITH tq AS ({_TOKENQ_SQL}), lf AS ({_LANGF_SQL})
    SELECT tq.doc_id, tq.n_tok, tq.n_ws, tq.n_bpe, tq.stopword_ratio,
           tq.punct_ratio, tq.quality,
           lf.lang, lf.pred_lang, lf.fp_md5, lf.fp64, lf.shingle_min
    FROM tq JOIN lf USING (doc_id) ORDER BY tq.doc_id
    """,
)
def txt_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 + lang-id + fingerprints in ONE labeled per-doc row (merged
    r4 to free a registry-window slot, same precedent as j3/j4 and
    c8_c11): token counting three ways, the quality heuristic,
    marker-vote language ID and md5/winnowing fingerprints are all
    narrow per-doc column algebra — computed in ONE projection over ONE
    documents scan (r6: the former two-subquery shape re-scanned the
    table and shuffled it through an equi-join just to put the columns
    side by side; per-doc expressions over the same rows need neither —
    guide §2.4). Column expressions and values are identical to the
    txt_token_quality / txt_lang_fingerprint building blocks, which
    remain the unit-testable pieces."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("double")
    n_punct = F.regexp_count("text", F.lit(r"[^A-Za-z0-9\s]")).cast("double")
    n_chars = F.length("text").cast("double")
    stop_ratio = n_stop / F.greatest(n_tok.cast("double"), F.lit(1.0))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1.0))
    quality = (
        F.least(n_tok / 64.0, F.lit(1.0))
        * (1.0 - F.least(punct_ratio, F.lit(1.0)))
        * (0.5 + 0.5 * F.least(stop_ratio * 5.0, F.lit(1.0)))
    )

    def _marker_hits(markers: list[str]):
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
    norm = F.lower(F.trim("text"))
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
        n_tok.alias("n_tok"),
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
        ).alias("n_ws"),
        F.regexp_count("text", F.lit(BPE_RE)).alias("n_bpe"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(quality, 4).alias("quality"),
        "lang",
        pred.alias("pred_lang"),
        F.md5(norm.cast("binary")).alias("fp_md5"),
        F.conv(F.substring(F.md5(norm.cast("binary")), 1, 8), 16, 10)
        .cast("long")
        .alias("fp64"),
        shingle_min.alias("shingle_min"),
    ).orderBy("doc_id")



