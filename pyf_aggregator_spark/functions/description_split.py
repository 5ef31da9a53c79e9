"""C6/C7 — HTML description splitting + badge detection.

The reference pipeline: rst_to_html.py renders RST/Markdown to HTML
(see functions/description_render.py), description_splitter.py then
cuts the HTML into the weighted search fields {title, first_chapter,
main_content, changelog} (the fields behind query_by_weights
10/10/5/3/1 — AGENTS.md:5-20), and screenshot_detector.py classifies
image URLs into badges vs real screenshots (badge-URL regex + the
min-width filter, whose network dimension fetch is skipped here).

Splitting semantics (description_splitter.py:26-253):
- flatten <section> wrappers (RST-rendered HTML nests sections) into a
  linear element list; bare top-level text is dropped like the
  reference's element-only iteration;
- title = plain text of the FIRST heading (any h1-h6);
- first_chapter = [start, 2nd heading) when the content STARTS with a
  heading, else [start, 1st heading); links dropped keeping their text,
  images removed; summary prepended;
- changelog = from the first heading whose text full-matches
  changelog|history|changes|release notes|what's new|version(s) to end;
- main_content = from the first excluded heading to the changelog.

The flattener uses the stdlib HTMLParser (lxml is not in this
container); strip_links/strip_images are regex tag surgery over our
generated HTML. Runs as an Arrow-batched pandas UDF; golden unit tests
stand in for oracle SQL (HTML transforms are the one family SURVEY §7
phase 5 leaves rows-only).
"""

from __future__ import annotations

import re
from html import escape as _escape
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# exact reference pattern set (description_splitter.py:27-34): note
# "changelog" is ONE word (no inner whitespace) and "release notes"
# is plural-only — "change log" / "release note" are NOT changelog
# headings there.
CHANGELOG_RE = re.compile(
    r"^(changelog|history|changes|release\s*notes|what'?s\s*new|versions?)$",
    re.IGNORECASE,
)
BADGE_URL_RE = re.compile(
    r"(shields\.io|badge|travis-ci|circleci|codecov|coveralls"
    r"|readthedocs\.(io|org)/projects/.*/badge|appveyor|/workflows/.*/badge)",
    re.IGNORECASE,
)

HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
_VOID_TAGS = {
    "img", "br", "hr", "input", "meta", "link", "source", "wbr", "embed",
    "area", "base", "col", "track", "param",
}
_TRANSPARENT_TAGS = {"section"}

SPLIT_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("first_chapter", T.StringType()),
        T.StructField("main_content", T.StringType()),
        T.StructField("changelog", T.StringType()),
    ]
)


class _Flattener(HTMLParser):
    """Linearize an HTML fragment into top-level elements, treating
    <section> wrappers as transparent (description_splitter.py:41-63).
    Each element keeps its serialized HTML and its plain text."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.elems: list[dict] = []
        self._depth = 0
        self._cur: dict | None = None

    def _open(self, tag: str) -> None:
        self._cur = {"tag": tag, "parts": [self.get_starttag_text()], "texts": []}

    def _finish(self) -> None:
        e = self._cur
        self._cur = None
        self.elems.append(
            {
                "tag": e["tag"],
                "html": "".join(e["parts"]),
                "text": "".join(e["texts"]).strip(),
            }
        )

    def handle_starttag(self, tag, attrs):
        if self._depth == 0:
            if tag in _TRANSPARENT_TAGS:
                return
            self._open(tag)
            if tag in _VOID_TAGS:
                self._finish()
            else:
                self._depth = 1
        else:
            self._cur["parts"].append(self.get_starttag_text())
            if tag not in _VOID_TAGS:
                self._depth += 1

    def handle_startendtag(self, tag, attrs):
        if self._depth == 0:
            if tag in _TRANSPARENT_TAGS:
                return
            self._open(tag)
            self._finish()
        else:
            self._cur["parts"].append(self.get_starttag_text())

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        if self._depth == 0:
            return  # closing a transparent wrapper
        self._cur["parts"].append(f"</{tag}>")
        self._depth -= 1
        if self._depth == 0:
            self._finish()

    def handle_data(self, data):
        if self._depth > 0:
            # parts carry SERIALIZED html: re-escape the decoded text
            # (&, <, >) exactly like the reference's lxml tostring —
            # emitting decoded data raw would produce invalid HTML for
            # text containing markup characters
            self._cur["parts"].append(_escape(data, quote=False))
            self._cur["texts"].append(data)
        # bare top-level text is dropped (reference iterates elements)


def _flatten(html: str) -> list[dict]:
    p = _Flattener()
    p.feed(html)
    p.close()
    if p._cur is not None:  # unclosed element — keep what we saw
        p._finish()
    return p.elems


def strip_links(html: str) -> str:
    """Drop <a> tags, keep their text (description_splitter.py:103-115)."""
    return re.sub(r"</?a\b[^>]*>", "", html or "")


def strip_images(html: str) -> str:
    """Remove <img> tags entirely (description_splitter.py:118-126)."""
    return re.sub(r"<img\b[^>]*>", "", html or "")


def _serialize(elems: list[dict], start: int, end: int | None = None) -> str:
    return "".join(e["html"] for e in elems[start:end])


def split_description_py(html: str, summary: str = "") -> dict:
    """HTML → {title, first_chapter, main_content, changelog}
    (description_splitter.py:129-253 semantics, shared by the UDF and
    the golden tests)."""
    result = {"title": "", "first_chapter": "", "main_content": "", "changelog": ""}
    html = html or ""
    if html.strip():
        try:
            elems = _flatten(html)
        except Exception:
            elems = None
        if not elems:
            result["first_chapter"] = html
        else:
            heads = [i for i, e in enumerate(elems) if e["tag"] in HEADING_TAGS]
            if not heads:
                result["first_chapter"] = _serialize(elems, 0)
            else:
                result["title"] = elems[heads[0]]["text"]
                changelog_idx = next(
                    (
                        i
                        for i in heads
                        if CHANGELOG_RE.match(elems[i]["text"].strip())
                    ),
                    None,
                )
                starts_with_heading = heads[0] == 0
                if starts_with_heading:
                    fc_end = heads[1] if len(heads) > 1 else None
                    main_start = heads[1] if len(heads) > 1 else None
                else:
                    fc_end = heads[0]
                    main_start = heads[0]
                result["first_chapter"] = _serialize(elems, 0, fc_end)
                if main_start is not None:
                    result["main_content"] = _serialize(
                        elems, main_start, changelog_idx
                    )
                if changelog_idx is not None:
                    result["changelog"] = _serialize(elems, changelog_idx)
        result["first_chapter"] = strip_images(
            strip_links(result["first_chapter"])
        )
    if summary:
        result["first_chapter"] = (
            f"{summary}\n\n{result['first_chapter']}"
            if result["first_chapter"]
            else summary
        )
    return result


def process(identifier: str, data: dict) -> dict:
    """The reference's per-document plugin entry point
    (description_splitter.py:256-292 contract): split
    ``data['description']`` and add the four weighted-search fields to
    ``data`` in place. Empty-section WARNINGS fire only when a
    description was provided, are judged BEFORE the summary prepend
    (a summary-only first_chapter still warns), and carry the package
    identifier so operators can find the offending doc. Driver-side
    single-doc path — the distributed path is split_description_udf."""
    import logging

    logger = logging.getLogger("pyf_aggregator_spark.plugins")
    description = data.get("description")
    sections = split_description_py(description or "")
    if description and description.strip():
        if not sections["first_chapter"]:
            logger.warning(
                "Package '%s': first_chapter is empty after splitting",
                identifier,
            )
        if not sections["main_content"]:
            logger.warning(
                "Package '%s': main_content is empty after splitting",
                identifier,
            )
    summary = data.get("summary", "")
    if summary:
        sections["first_chapter"] = (
            f"{summary}\n\n{sections['first_chapter']}"
            if sections["first_chapter"]
            else summary
        )
    data.update(sections)
    return data


@pandas_udf(SPLIT_SCHEMA)
def split_description_udf(html: pd.Series, summary: pd.Series) -> pd.DataFrame:
    recs = [
        split_description_py(t, s or "")
        for t, s in zip(html.fillna(""), summary.fillna(""))
    ]
    return pd.DataFrame(recs)


def is_badge_url(col) -> "F.Column":
    """C7: badge-URL detection as a JVM rlike (screenshot_detector.py:
    18-43); the ≥200px width filter needs the image bytes → stubbed out
    like the reference's network fetch in tests."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(
        r"(?i)(shields\.io|badge|travis-ci|circleci|codecov|coveralls"
        r"|readthedocs\.(io|org)/projects/.*/badge|appveyor|/workflows/.*/badge)"
    )
