"""Golden-output transform tests (the reference's discipline: exhaustive
parametrized expected outputs for pure transforms — SURVEY §5).

Expected values follow the reference's documented semantics:
version_slicer.py:51-102 + README.md:989-1008 (sortable encoding),
github.py:53-113 (URL grammars), indexer.py:12-37 (keyword split, null
normalization), fetcher.py:139-146 (timestamps).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyf_aggregator_spark.functions.transforms import (
    github_owner_repo,
    iso_to_unix,
    keyword_split,
    version_parse,
    version_sortable,
)

VERSION_SORTABLE_GOLDEN = [
    # (version, sortable) — stable always outranks pre-release desc
    ("2.5.3", "1.0002.0005.0003.0000.0000"),
    ("3.0.0a2", "0.0003.0000.0000.0001.0002"),
    ("1.0rc1", "0.0001.0000.0000.0003.0001"),
    ("2.0b4", "0.0002.0000.0000.0002.0004"),
    ("1.2.dev3", "0.0001.0002.0000.0000.0003"),
    ("1.0", "1.0001.0000.0000.0000.0000"),
    ("1.2.3.4", "0.0000.0000.0000.0000.0000"),  # regex no-match → default
    ("banana", "0.0000.0000.0000.0000.0000"),
    ("17.0.0", "1.0017.0000.0000.0000.0000"),
]

VERSION_PARSE_GOLDEN = [
    # (version, major, minor, bugfix, postfix, version_postfix)
    ("2.5.3", 2, 5, 3, "", ""),
    ("3.0.0a2", 3, 0, 0, "", "a2"),
    ("1.0rc1", 1, 0, 0, "rc1", ""),
    ("1.2.3.4", 0, 0, 0, "", ""),  # single-digit bugfix rule → no match
    ("0.3.10", 0, 0, 0, "", ""),   # two-digit bugfix → no match (ref quirk)
]

GITHUB_GOLDEN = [
    ("https://github.com/plone/plone.api", "plone/plone.api"),
    ("git://github.com/plone/plone.api.git", "plone/plone.api"),
    ("git+https://github.com/o/r.git", "o/r"),
    ("git+ssh://git@github.com/o/r.git", "o/r"),
    ("git@github.com:o/r.git", "o/r"),
    # scheme XOR www in the reference grammar (github.py:54): a URL with
    # BOTH "https://" and "www." matches neither branch → no repo
    ("https://www.github.com/weird/ver#readme", None),
    ("www.github.com/weird/ver#readme", "weird/ver"),
    ("git@github.com:beta/pkg?query=1", "beta/pkg"),
    ("https://github.com/about/x", None),  # reserved owner
    ("https://example.org/not-github", None),
    ("", None),
]


def _eval(spark, col, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in df.select(col.alias("out")).collect()]


def test_version_sortable_golden(spark):
    vals = [v for v, _ in VERSION_SORTABLE_GOLDEN]
    got = _eval(spark, version_sortable("v"), vals)
    for (v, want), g in zip(VERSION_SORTABLE_GOLDEN, got):
        assert g == want, f"{v}: {g} != {want}"


def test_version_sortable_orders_like_pypi_latest(spark):
    """Desc lexicographic sort == PyPI 'latest': stable 2.5.3 above
    pre-release 3.0.0a2 (README.md:994-1006)."""
    order = sorted(
        VERSION_SORTABLE_GOLDEN, key=lambda x: x[1], reverse=True
    )
    top = [v for v, _ in order[:3]]
    assert top[0] == "17.0.0" and "2.5.3" in top
    assert order[0][1] > "0.9999"  # every stable beats every pre-release


def test_version_parse_golden(spark):
    vals = [v[0] for v in VERSION_PARSE_GOLDEN]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    rows = df.select(version_parse("v").alias("p")).collect()
    for (v, ma, mi, bu, pf, vpf), r in zip(VERSION_PARSE_GOLDEN, rows):
        p = r["p"]
        assert (
            p["version_major"], p["version_minor"], p["version_bugfix"],
            p["postfix"], p["version_postfix"],
        ) == (ma, mi, bu, pf, vpf), v


def test_github_owner_repo_golden(spark):
    got = _eval(spark, github_owner_repo("v"), [u for u, _ in GITHUB_GOLDEN])
    for (u, want), g in zip(GITHUB_GOLDEN, got):
        assert g == want, f"{u}: {g} != {want}"


def test_keyword_split_golden(spark):
    got = _eval(spark, keyword_split("v"), ["plone, api  rest", "a,,b", " ", ""])
    assert got[0] == ["plone", "api", "rest"]
    assert got[1] == ["a", "b"]
    assert got[2] == []
    assert got[3] == []


def test_iso_to_unix_golden(spark):
    got = _eval(
        spark,
        iso_to_unix("v"),
        ["2023-06-15T10:30:00Z", "", "garbage", "1970-01-01T00:00:00Z"],
    )
    assert got[0] == 1686825000
    assert got[1] == 0 and got[2] == 0
    assert got[3] == 0


def test_tie_break_is_total(spark):
    """Rank determinism: equal rounded scores order by doc_id asc."""
    df = spark.createDataFrame(
        [(2, 1.00004), (1, 1.00001), (3, 0.5)], "doc_id long, s double"
    )
    rows = (
        df.select("doc_id", F.round("s", 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    )
    assert [r["doc_id"] for r in rows] == [1, 2, 3]


def test_s7_readme_attach_branches(spark):
    """S7 cascade semantics (npm_fetcher.py:394-474): every fixture
    branch resolves by the right rule — exact README.md FILE beats the
    listing, a README.md DIRECTORY does not satisfy the exact fetch,
    the listing picks the FIRST readme* file in listing order, package
    fallback covers no-readme and no-files versions, and a package
    with no registry readme yields none."""
    from pyf_aggregator_spark.operators.relational import s7_readme_attach

    rows = {
        (r["name"], r["version"]): (r["readme_source"], r["readme"])
        for r in s7_readme_attach(spark, "unused").collect()
    }
    assert rows[("pkg-a", "1.0.0")] == ("file", "# pkg-a v1 readme")
    assert rows[("pkg-a", "2.0.0")] == ("listing", "pkg-a v2 readme")
    # README.md dir must NOT satisfy the exact branch
    assert rows[("pkg-b", "1.0.0")] == ("listing", "pkg-b v1 rst readme")
    assert rows[("pkg-b", "2.0.0")] == (
        "package", "pkg-b latest readme from registry doc"
    )
    # two readme* files: FIRST in listing order wins
    assert rows[("pkg-b", "3.0.0")] == ("listing", "pkg-b v3 md readme")
    # no files at all → package doc readme
    assert rows[("pkg-c", "1.0.0")] == (
        "package", "pkg-c latest readme from registry doc"
    )
    assert rows[("pkg-d", "1.0.0")] == ("none", None)
