"""Registry entries for C5/C6 (description split) and C7 (badges)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyf_aggregator_spark.functions.description_render import (
    render_description_udf,
)
from pyf_aggregator_spark.functions.description_split import (
    is_badge_url,
    split_description_udf,
)
from pyf_aggregator_spark.registry import register

# (id, description_content_type, description, summary) — one row per
# renderer dispatch branch (rst_to_html.py:10-16): markdown, RST via
# the None/'' PyPI default, explicit text/x-rst, text/plain
_DESC_DOCS = [
    (
        1, "text/markdown",
        "# Pkg One\nfirst chapter.\n## Usage\nuse it.\n## Changelog\n- 1.0\n",
        "sum one",
    ),
    (
        2, None,
        "Pkg Two\n=======\n\nbody para\n\nHistory\n-------\n\nold stuff\n",
        "",
    ),
    (3, "text/plain", "plain prose only", "short summary"),
    (4, "text/markdown", "intro text\n# Real Title\nbody\n", None),
    (
        5, "text/x-rst",
        "Pkg Five\n========\n\nintro\n\nUsage\n-----\n\nuse ``x``\n\n"
        "Release Notes\n-------------\n\n- 2.0\n",
        "five",
    ),
]

_URLS = [
    (1, "https://img.shields.io/pypi/v/x.svg"),
    (2, "https://travis-ci.org/o/r.svg?branch=main"),
    (3, "https://example.com/screenshot.png"),
    (4, "https://codecov.io/gh/o/r/badge.svg"),
    (5, "https://raw.githubusercontent.com/o/r/main/docs/ui.png"),
]

_BADGE_RE_SQL = (
    "(?i)(shields\\.io|badge|travis-ci|circleci|codecov|coveralls"
    "|readthedocs\\.(io|org)/projects/.*/badge|appveyor|/workflows/.*/badge)"
)


@register("c5c6_description_split", None)  # HTML-family: golden-tested, rows-only
def c5c6_description_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5+C6 end-to-end: content-type dispatch render (docutils RST /
    markdown subset / escaped plain), heading demotion h1→h2, then the
    HTML splitter into the weighted search fields {title, first_chapter,
    main_content, changelog} — two chained Arrow-batched pandas UDFs
    (rst_to_html.py + description_splitter.py)."""
    from pyf_aggregator_spark.session import ensure_py_files

    ensure_py_files(spark)  # the UDF bodies import this package on workers
    df = spark.createDataFrame(
        _DESC_DOCS, "id int, content_type string, description string, summary string"
    )
    return (
        df.select(
            "id",
            "summary",
            render_description_udf("description", "content_type").alias("html"),
        )
        .select("id", split_description_udf("html", "summary").alias("s"))
        .select("id", "s.title", "s.first_chapter", "s.main_content", "s.changelog")
        .orderBy("id")
    )


@register(
    "c7_badge_detection",
    f"""
    SELECT * FROM (VALUES
      (1, 'https://img.shields.io/pypi/v/x.svg'),
      (2, 'https://travis-ci.org/o/r.svg?branch=main'),
      (3, 'https://example.com/screenshot.png'),
      (4, 'https://codecov.io/gh/o/r/badge.svg'),
      (5, 'https://raw.githubusercontent.com/o/r/main/docs/ui.png')
    ) AS t(id, url)
    WHERE NOT regexp_matches(url, '{_BADGE_RE_SQL}')
    ORDER BY id
    """,
)
def c7_badge_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: keep real screenshots = drop badge URLs
    (screenshot_detector.py:18-43; the min-width image fetch stubbed)."""
    df = spark.createDataFrame(_URLS, "id int, url string")
    return df.filter(~is_badge_url("url")).orderBy("id")
