"""Health-score fixture — exact-formula parity input.

A literal table shaped like the reference's package document at
health-scoring time (plugins/health_score.py:15-70 reads
upload_timestamp, docs_url, description, project_urls, first_chapter,
main_content, maintainer, author, license, registry,
classifiers/keywords; enrichers/health_calculator.py:104-183 adds
github_stars, github_updated, github_open_issues). Rendered both as a
Spark DataFrame and a DuckDB VALUES CTE so the driver's oracle
comparison runs on byte-identical input.

Column conventions (the doc-dict → table flattening):
- ``upload_ts`` long: the int64 branch; 0 = missing (reference treats
  int 0 as "no release timestamp"). NULL = field absent → the legacy
  ISO branch via ``upload_iso``.
- ``upload_iso`` string: legacy ISO support. The reference subtracts
  an AWARE now — a naive ISO string raises TypeError and is caught as
  "no release timestamp" (health_score.py:108-136), so only strings
  with an explicit offset (Z / ±HH:MM) count.
- ``purl_keys``/``purl_vals``: project_urls dict as parallel arrays in
  dict-iteration order.
- NULL scalar = key absent from the doc (matters for the
  "github_open_issues" in data / "github_stars" in data gate,
  health_calculator.py:170-176).

Rows cover every scoring bucket boundary, the meaningful-docs-URL
rejection grammar, width-attr/style/undeterminable screenshot paths,
badge filtering, the npm keywords branch, and the naive/malformed ISO
fallbacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pyf_aggregator_spark.fixtures.packages import _sql_lit

# Deterministic "now" for recency/activity aging (the reference uses
# wall-clock datetime.now(); pinned here so Spark, DuckDB and the
# golden tests agree): 2024-06-01T00:00:00Z.
NOW_TS = 1717200000

_D = 86400  # seconds/day


def _ago(days: int) -> int:
    return NOW_TS - days * _D


# h04: description of EXACTLY 150 chars (the >150 check must fail)
# containing a style-width screenshot that must still be detected.
_H04_IMG = '<img src="https://example.com/diagram.png" style="width: 300px">'
_H04_DESC = (_H04_IMG + " architecture diagram ").ljust(150, "x")
assert len(_H04_DESC) == 150

_LONG = (
    "This package provides a comprehensive toolkit with extensive "
    "configuration options, a plugin system, and thorough documentation "
    "covering every public API surface in detail."
)
assert len(_LONG) > 150

ROWS: list[tuple] = [
    (
        "h01-top",
        _ago(100), None,
        "https://acme.readthedocs.io/en/latest/",
        _LONG
        + ' <img src="https://img.shields.io/pypi/v/acme.svg">'
        + ' <img src="https://example.com/shot.png" width="600">',
        ["Documentation", "Source"],
        ["https://acme.readthedocs.io/", "https://github.com/acme/acme"],
        "intro", "docs",
        "Alice", None, "MIT", "pypi",
        ["Framework :: Plone", "Topic :: Utilities", "Typing :: Typed"],
        [],
        1500, _ago(10), 50,
    ),
    (
        "h02-mid",
        _ago(200), None,
        None,
        "Short text.",
        ["Homepage"], ["https://github.com/mid/pkg"],
        "one two three", None,
        None, "Bob", None, "npm",
        ["x", "y", "z", "w"], ["a", "b"],
        60, _ago(200), None,
    ),
    (
        "h03-zerots",
        0, None,
        "https://pypi.org/project/zerots/",
        _LONG,
        [], [],
        ("doc " * 499).strip(), "tail",
        "Zoe", None, "GPL", None,
        ["A", "B", "C"], [],
        None, None, None,
    ),
    (
        "h04-legacy-iso",
        None, "2023-05-15T00:00:00Z",
        "https://github.com/leg/iso/wiki",
        _H04_DESC,
        ["docs"], ["https://docs.example.com/"],
        "tiny", None,
        "Xe", "Ya", "BSD", "pypi",
        ["C1", "C2", "C3", "C4", "C5"], [],
        120, _ago(120), 80,
    ),
    (
        "h05-naive-iso",
        None, "2024-01-15T10:30:00",
        "https://gitlab.com/grp/proj#readme",
        None,
        ["Home"], ["https://www.github.com/grp/proj/"],
        None, None,
        None, None, "MIT", "pypi",
        ["C1", "C2"], [],
        5, _ago(400), 10,
    ),
    (
        "h06-oldest",
        _ago(2000), None,
        "https://example.com/docs",
        _LONG
        + ' <img src="https://badge.fury.io/py/old.svg">'
        + ' <img src="https://example.com/pic.png">',
        ["Changelog"], ["https://example.com/ch"],
        "a few words here", None,
        None, "Ann", None, "pypi",
        [], [],
        1000, _ago(29), 99,
    ),
    (
        "h07-boundaries",
        _ago(180), None,
        None,
        _LONG
        + ' <img src="https://example.com/small.png" width="199">'
        + ' <img src="https://example.com/big.png" width="200">',
        ["documentation link", "other"],
        ["https://proj.readthedocs.io/", "https://x.example.com"],
        ("w " * 499).strip(), None,
        "Mia", None, "Apache-2.0", "npm",
        [], ["k1", "k2", "k3"],
        10, _ago(90), 1,
    ),
    (
        "h08-cap",
        _ago(50), None,
        "https://capdocs.example.io/guide",
        _LONG
        + ' <img src="https://example.com/s1.png" width="640">'
        + ' <img src="https://example.com/s2.png" style="width: 480px">',
        ["Source", "docs"],
        ["https://github.com/c/c", "https://cap.readthedocs.io/"],
        None, None,
        None, "Cy", "MIT", "pypi",
        ["C1", "C2", "C3", "C4", "C5", "C6"], [],
        500, _ago(50), 20,
    ),
    (
        "h09-bad-iso",
        None, "not-a-date",
        "",
        "",
        [], [],
        None, None,
        None, None, "", "pypi",
        [], [],
        None, None, None,
    ),
    (
        "h10-ratio-edge",
        _ago(800), None,
        "http://readthedocs.org/projects/x/badge",
        _LONG
        + ' <img src="">'
        + ' <img src="https://codecov.io/gh/r/e/badge.svg" width="600">',
        ["HOMEPAGE"], ["https://ratio.example.org/home"],
        None, None,
        "Rae", None, "MIT", "pypi",
        ["C1", "C2", "C3"], [],
        49, _ago(180), 0,
    ),
    (
        "h11-threefive",
        _ago(1200), None,
        None,
        _LONG,
        [], [],
        "short readme", None,
        None, "Avi", None, "pypi",
        ["C1", "C2", "C3"], [],
        None, None, None,
    ),
    (
        # data-* attribute trap: data-width must NOT be read as the
        # width attribute (lxml .get("width") semantics) — the first
        # img's width comes from its style (250 ≥ 200 → screenshot;
        # an unanchored regex would read data-width=150 and reject);
        # the second img has NO src (data-src is not src) → skipped.
        "h12-data-attrs",
        _ago(10), None,
        None,
        _LONG
        + ' <img src="https://example.com/lazy.png" data-width="150"'
        + ' style="width: 250px">'
        + ' <img data-src="https://example.com/ghost.png" width="600">',
        [], [],
        None, None,
        None, "Dot", "MIT", "pypi",
        ["C1", "C2", "C3"], [],
        None, None, None,
    ),
]

SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("upload_ts", T.LongType(), True),
        T.StructField("upload_iso", T.StringType(), True),
        T.StructField("docs_url", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("purl_keys", T.ArrayType(T.StringType()), True),
        T.StructField("purl_vals", T.ArrayType(T.StringType()), True),
        T.StructField("first_chapter", T.StringType(), True),
        T.StructField("main_content", T.StringType(), True),
        T.StructField("maintainer", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("license", T.StringType(), True),
        T.StructField("registry", T.StringType(), True),
        T.StructField("classifiers", T.ArrayType(T.StringType()), True),
        T.StructField("keywords", T.ArrayType(T.StringType()), True),
        T.StructField("github_stars", T.IntegerType(), True),
        T.StructField("github_updated", T.LongType(), True),
        T.StructField("github_open_issues", T.IntegerType(), True),
    ]
)

_COLS = ", ".join(f.name for f in SCHEMA.fields)


def health_docs_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROWS, SCHEMA)


def health_values_sql() -> str:
    """DuckDB CTE body: `health_docs` with the identical rows."""
    values = ",\n    ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in ROWS
    )
    return (
        f"health_docs({_COLS}) AS (\n  SELECT * FROM (VALUES\n    "
        + values
        + "\n  ))"
    )
