"""Golden tests for C5/C6/C7 (description split + badge detection),
mirroring the reference's test_description_splitter.py discipline."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyf_aggregator_spark.functions.description_split import (
    is_badge_url,
    split_description_py,
    split_description_udf,
)

DOC = """Intro preamble text.

# My Package

This is the first chapter body.

## Usage

Call the thing.

## Changelog

- 1.0: first release
"""


def test_split_basic():
    got = split_description_py(DOC)
    assert got["title"] == "My Package"
    assert got["first_chapter"] == "This is the first chapter body."
    assert "Usage\nCall the thing." == got["main_content"].split("\n\n")[-1]
    assert got["main_content"].startswith("Intro preamble")
    assert got["changelog"].startswith("Changelog")
    assert "1.0: first release" in got["changelog"]


def test_split_setext_headings():
    got = split_description_py("Title\n=====\nbody one\n\nHistory\n-------\nold stuff\n")
    assert got["title"] == "Title"
    assert got["first_chapter"] == "body one"
    assert "old stuff" in got["changelog"]


def test_split_no_headings_summary_prepended():
    got = split_description_py("just prose", summary="a summary")
    assert got["title"] == "" and got["changelog"] == ""
    assert got["main_content"].startswith("a summary")
    assert got["main_content"].endswith("just prose")


def test_split_changelog_variants():
    for h in ["Changelog", "CHANGES", "Release Notes", "History", "change log"]:
        got = split_description_py(f"# T\nfc\n## {h}\nentries\n")
        assert "entries" in got["changelog"], h
    got = split_description_py("# T\nfc\n## Changing the API\nnot a changelog\n")
    assert got["changelog"] == ""  # word-boundary: 'Changing' is not


def test_udf_matches_python(spark):
    rows = [(DOC, "sum"), ("plain", ""), ("Title\n====\nbody", None)]
    df = spark.createDataFrame(rows, "text string, summary string")
    got = df.select(
        split_description_udf("text", "summary").alias("s")
    ).collect()
    for (text, summary), r in zip(rows, got):
        want = split_description_py(text, summary or "")
        assert r["s"].asDict() == want


def test_badge_detection(spark):
    urls = [
        ("https://img.shields.io/pypi/v/x.svg", True),
        ("https://travis-ci.org/o/r.svg?branch=main", True),
        ("https://codecov.io/gh/o/r/badge.svg", True),
        ("https://example.com/screenshot.png", False),
        ("https://raw.githubusercontent.com/o/r/main/docs/ui.png", False),
    ]
    df = spark.createDataFrame([(u,) for u, _ in urls], "url string")
    got = [r["b"] for r in df.select(is_badge_url("url").alias("b")).collect()]
    assert got == [w for _, w in urls]
