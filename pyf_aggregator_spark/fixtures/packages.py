"""Package-document fixture — reference-capability parity tests.

A small literal table mirroring the reference's document model
(FIXTURES.md §4, values shaped like tests/conftest.py:32-311 in the
reference). Defined ONCE here and rendered both as a Spark DataFrame
and as a DuckDB VALUES clause so the driver's oracle comparison runs on
byte-identical input.

Columns: name, version, summary, classifiers array<string>,
keywords string (comma/space mixed), upload_iso string (ISO8601 Z, ''
= missing), registry string (nullable → legacy-null semantics,
db.py:310-315), home_page string (GitHub URLs in all 5 grammars,
github.py:53-66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ROWS: list[tuple] = [
    (
        "plone.api", "2.5.3", "Plone API layer",
        ["Framework :: Plone", "Framework :: Plone :: 6.0",
         "Programming Language :: Python :: 3.11"],
        "plone, api  rest",
        "2023-06-15T10:30:00Z", "pypi",
        "https://github.com/plone/plone.api",
    ),
    (
        "plone.api", "3.0.0a2", "Plone API layer (alpha)",
        ["Framework :: Plone", "Framework :: Plone :: 6.1",
         "Programming Language :: Python :: 3.12"],
        "plone,api",
        "2024-01-20T08:00:00Z", "pypi",
        "git://github.com/plone/plone.api.git",
    ),
    (
        "flask-restful", "0.3.10", "REST API framework",
        ["Framework :: Flask", "Programming Language :: Python :: 3.10"],
        "flask restful,  api",
        "2023-03-01T00:00:00Z", "pypi",
        "git+https://github.com/flask-restful/flask-restful.git",
    ),
    (
        "@plone/volto", "17.0.0", "Volto frontend",
        ["Framework :: Plone :: 6.0"],
        "react volto cms",
        "2023-11-05T12:00:00Z", "npm",
        "git+ssh://git@github.com/plone/volto.git",
    ),
    (
        "@plone/volto", "18.0.0rc1", "Volto frontend (rc)",
        ["Framework :: Plone :: 6.1"],
        "react,volto",
        "2024-05-10T09:15:00Z", "npm",
        "git@github.com:plone/volto.git",
    ),
    (
        "oldpkg", "1.0", "Pre-registry legacy package",
        ["Topic :: Utilities"],
        "",
        "", None,  # missing timestamp + legacy null registry
        "https://example.org/not-github",
    ),
    (
        "weirdver", "1.2.dev3", "Dev-release versioning",
        ["Development Status :: 3 - Alpha"],
        "dev tools",
        "2022-07-04T17:45:00Z", "pypi",
        "https://www.github.com/weird/ver#readme",
    ),
    (
        "betapkg", "2.0b4", "Beta versioning",
        ["Programming Language :: Python :: 3.11",
         "Framework :: Plone"],
        "beta, testing",
        "2023-09-09T09:09:09Z", "pypi",
        "https://github.com/about/invalid-owner",  # reserved owner → invalid
    ),
    (
        "nomatch", "1.2.3.4", "Four-segment version (regex no-match)",
        [],
        None,
        "2021-12-31T23:59:59Z", "pypi",
        "git@github.com:beta/pkg?query=1",
    ),
]

SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("version", T.StringType(), False),
        T.StructField("summary", T.StringType(), True),
        T.StructField("classifiers", T.ArrayType(T.StringType()), False),
        T.StructField("keywords", T.StringType(), True),
        T.StructField("upload_iso", T.StringType(), True),
        T.StructField("registry", T.StringType(), True),
        T.StructField("home_page", T.StringType(), True),
    ]
)


def packages_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROWS, SCHEMA)


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, list):
        inner = ", ".join(_sql_lit(x) for x in v)
        return f"[{inner}]"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def packages_values_sql() -> str:
    """DuckDB CTE body: `packages` with the identical rows."""
    values = ",\n    ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in ROWS
    )
    return (
        "packages(name, version, summary, classifiers, keywords, "
        "upload_iso, registry, home_page) AS (\n  SELECT * FROM (VALUES\n    "
        + values
        + "\n  ))"
    )


# Enrichment fixture for the J1 preserved-fields merge (main.py:115-160):
# the "existing collection" holding GitHub fields that must be preserved
# onto freshly-fetched docs where the fresh value is missing.
ENRICHMENT_ROWS: list[tuple] = [
    ("plone.api", 350, 12, "2023-06-01T00:00:00Z"),
    ("plone.api", 340, 10, "2023-01-01T00:00:00Z"),  # older row — must lose
    ("flask-restful", 6800, 40, "2023-02-15T00:00:00Z"),
    ("ghostpkg", 5, 1, "2020-01-01T00:00:00Z"),  # not refreshed → dropped
]

ENRICHMENT_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("github_stars", T.IntegerType(), True),
        T.StructField("github_open_issues", T.IntegerType(), True),
        T.StructField("enriched_iso", T.StringType(), False),
    ]
)


def enrichment_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ENRICHMENT_ROWS, ENRICHMENT_SCHEMA)


def enrichment_values_sql() -> str:
    values = ",\n    ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in ENRICHMENT_ROWS
    )
    return (
        "enrichment(name, github_stars, github_open_issues, enriched_iso) AS (\n"
        "  SELECT * FROM (VALUES\n    " + values + "\n  ))"
    )
