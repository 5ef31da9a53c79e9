"""Result highlighting — Typesense returns per-field ``highlight``
snippets with matched tokens wrapped in <mark> (on by default for
every query_by field); the reference UI consumes them.

JVM-only column algebra: one regexp_replace wraps every matched token
(token boundaries = the tokenizer's separator class or string edges,
case-insensitive), one regexp_extract cuts the snippet window around
the first match. No UDF, no second scan — applied to the k-row hit set
after hydration, so cost is O(k), not corpus-sized.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEP = r"[\s.\-_@/]"


def _alts(terms: list[str]) -> str:
    return "|".join(re.escape(t) for t in sorted(set(terms), key=len, reverse=True))


def highlight_col(text: Column, terms: list[str]) -> Column:
    """Wrap every tokenizer-boundary occurrence of the terms in
    <mark>…</mark> (case-insensitive, original casing preserved)."""
    if not terms:
        return text
    pat = f"(?i)(^|{_SEP})({_alts(terms)})(?={_SEP}|$)"
    return F.regexp_replace(text, pat, "$1<mark>$2</mark>")


def snippet_col(text: Column, terms: list[str], context: int = 30) -> Column:
    """A window of ±context characters around the FIRST matched token
    (empty when nothing matches — Typesense omits the snippet then)."""
    if not terms:
        return F.lit("")
    pat = f"(?i).{{0,{context}}}(?:^|{_SEP})(?:{_alts(terms)})(?:{_SEP}|$).{{0,{context}}}"
    return F.regexp_extract(text, pat, 0)


def with_highlights(
    hits, docs, terms: list[str], text_col: str = "text", context: int = 30
):
    """hits(doc_id, score) ⋈ docs → + highlight + snippet columns.
    The k-row hit side broadcasts; the corpus is probed by doc_id."""
    joined = F.broadcast(hits).join(
        docs.select("doc_id", text_col), "doc_id"
    )
    return joined.select(
        "doc_id",
        "score",
        highlight_col(F.col(text_col), terms).alias("highlight"),
        snippet_col(F.col(text_col), terms, context).alias("snippet"),
    ).orderBy(F.desc("score"), F.asc("doc_id"))
