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


# S7 secondary-content fixture (npm_fetcher.py:394-474): the jsDelivr
# CDN modeled as TABLES — `readme_files` is the per-version published
# file listing (file_idx = listing order, ftype mirrors the API's
# type field), `npm_docs` is the registry package document whose
# latest-version readme is the final fallback. Covers every branch of
# get_version_readme: exact README.md file, case/extension fallback
# via the listing (first readme* FILE in listing order), a README.md
# DIRECTORY that must not satisfy the exact fetch, versions with
# files but no readme, versions with no files at all, and a package
# with no fallback readme either.
README_FILE_ROWS: list[tuple] = [
    # exact README.md at root → direct-fetch branch
    ("pkg-a", "1.0.0", 0, "file", "README.md", "# pkg-a v1 readme"),
    ("pkg-a", "1.0.0", 1, "file", "index.js", "js"),
    # only a lowercase readme.markdown → listing-resolution branch
    ("pkg-a", "2.0.0", 0, "file", "index.js", "js"),
    ("pkg-a", "2.0.0", 1, "file", "readme.markdown", "pkg-a v2 readme"),
    # README.md is a DIRECTORY (docs folder) + Readme.rst file later in
    # the listing → exact fetch misses, listing picks Readme.rst
    ("pkg-b", "1.0.0", 0, "dir", "README.md", None),
    ("pkg-b", "1.0.0", 1, "file", "main.ts", "ts"),
    ("pkg-b", "1.0.0", 2, "file", "Readme.rst", "pkg-b v1 rst readme"),
    # two readme* files → FIRST in listing order wins
    ("pkg-b", "3.0.0", 3, "file", "README.markdown", "pkg-b v3 md readme"),
    ("pkg-b", "3.0.0", 5, "file", "readme.txt", "pkg-b v3 txt readme"),
    # files exist but none readme* → package-document fallback
    ("pkg-b", "2.0.0", 0, "file", "main.ts", "ts"),
    # pkg-c 1.0.0: NO file rows at all → package-document fallback
    # pkg-d 1.0.0: no file rows AND no package readme → none
]

README_FILE_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("version", T.StringType(), False),
        T.StructField("file_idx", T.IntegerType(), False),
        T.StructField("ftype", T.StringType(), False),
        T.StructField("filename", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
    ]
)

NPM_DOC_ROWS: list[tuple] = [
    ("pkg-a", "2.0.0", "pkg-a latest readme from registry doc"),
    ("pkg-b", "3.0.0", "pkg-b latest readme from registry doc"),
    ("pkg-c", "1.0.0", "pkg-c latest readme from registry doc"),
    ("pkg-d", "1.0.0", None),  # registry doc with no readme at all
]

NPM_DOC_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("latest_version", T.StringType(), False),
        T.StructField("latest_readme", T.StringType(), True),
    ]
)

# the (name, version) pairs the orchestration walks (npm_fetcher.py:
# 704-786 iterates the package doc's versions)
NPM_VERSION_ROWS: list[tuple] = [
    ("pkg-a", "1.0.0"), ("pkg-a", "2.0.0"),
    ("pkg-b", "1.0.0"), ("pkg-b", "2.0.0"), ("pkg-b", "3.0.0"),
    ("pkg-c", "1.0.0"),
    ("pkg-d", "1.0.0"),
]


def readme_files_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(README_FILE_ROWS, README_FILE_SCHEMA)


def npm_docs_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(NPM_DOC_ROWS, NPM_DOC_SCHEMA)


def npm_versions_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        NPM_VERSION_ROWS, "name string, version string"
    )


def _values_cte(name: str, cols: str, rows: list[tuple]) -> str:
    values = ",\n    ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in rows
    )
    return f"{name}({cols}) AS (\n  SELECT * FROM (VALUES\n    {values}\n  ))"


def readme_files_values_sql() -> str:
    return _values_cte(
        "readme_files", "name, version, file_idx, ftype, filename, content",
        README_FILE_ROWS,
    )


def npm_docs_values_sql() -> str:
    return _values_cte(
        "npm_docs", "name, latest_version, latest_readme", NPM_DOC_ROWS
    )


def npm_versions_values_sql() -> str:
    return _values_cte("npm_versions", "name, version", NPM_VERSION_ROWS)
