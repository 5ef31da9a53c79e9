"""Golden tests for C5 (content-type dispatch render + heading
demotion) and C6 (HTML split) and C7 (badges) — re-deriving the
reference's expected-output discipline (tests/test_rst_to_html.py,
tests/test_description_splitter.py) on our own fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyf_aggregator_spark.functions.description_render import (
    md_to_html,
    normalize_headings_py,
    render_description_py,
)
from pyf_aggregator_spark.functions.description_split import (
    is_badge_url,
    split_description_py,
    strip_images,
    strip_links,
)

# ------------------------------------------------------------------ render


def test_markdown_render_golden():
    got = md_to_html("# T\nbody *x* and `c`\n\n- a\n- b\n\n```\nraw <code>\n```\n")
    assert got == (
        "<h1>T</h1><p>body <em>x</em> and <code>c</code></p>"
        "<ul><li>a</li><li>b</li></ul>"
        "<pre><code>raw &lt;code&gt;</code></pre>"
    )


def test_markdown_setext_and_links():
    got = md_to_html("Title\n=====\nsee [docs](http://d) ![logo](http://i.png)\n")
    assert got == (
        '<h1>Title</h1><p>see <a href="http://d">docs</a> '
        '<img src="http://i.png" alt="logo"></p>'
    )


def test_heading_demotion_caps_at_h6():
    assert normalize_headings_py("<h1>a</h1><h5>b</h5><h6>c</h6>") == (
        "<h2>a</h2><h6>b</h6><h6>c</h6>"
    )


def test_render_dispatch_markdown_demotes():
    got = render_description_py("# T\nbody\n", "text/markdown")
    assert got == "<h2>T</h2><p>body</p>"


def test_render_dispatch_plain_escapes():
    got = render_description_py("a <b> & c", "text/plain")
    assert got == "<pre>a &lt;b&gt; &amp; c</pre>"


def test_render_default_is_rst():
    """PyPI's default content type is RST (rst_to_html.py:10-16):
    None/'' must go through docutils, producing section-wrapped HTML
    with demoted headings."""
    rst = "Top\n===\n\nintro\n\nUsage\n-----\n\nuse it\n"
    for ct in (None, "", "text/x-rst"):
        got = render_description_py(rst, ct)
        assert "<section" in got, ct
        assert "<h1" not in got, ct  # demoted
        assert "Usage" in got and "use it" in got


def test_render_content_type_params_stripped():
    got = render_description_py("# T\nb\n", "text/markdown; charset=UTF-8")
    assert got == "<h2>T</h2><p>b</p>"


# ------------------------------------------------------------------- split


def test_split_starts_with_heading():
    """Content starting with a heading: first_chapter = heading + body
    up to the SECOND heading; main from the second heading."""
    html = (
        "<h2>My Package</h2><p>first chapter body.</p>"
        "<h3>Usage</h3><p>call it.</p>"
        "<h3>Changelog</h3><ul><li>1.0</li></ul>"
    )
    got = split_description_py(html)
    assert got["title"] == "My Package"
    assert got["first_chapter"] == "<h2>My Package</h2><p>first chapter body.</p>"
    assert got["main_content"] == "<h3>Usage</h3><p>call it.</p>"
    assert got["changelog"] == "<h3>Changelog</h3><ul><li>1.0</li></ul>"


def test_split_starts_with_text():
    """Content starting with text: first_chapter = text BEFORE the first
    heading (heading excluded); main from the first heading."""
    html = "<p>intro prose.</p><h2>Real Title</h2><p>body</p>"
    got = split_description_py(html)
    assert got["title"] == "Real Title"
    assert got["first_chapter"] == "<p>intro prose.</p>"
    assert got["main_content"] == "<h2>Real Title</h2><p>body</p>"
    assert got["changelog"] == ""


def test_split_changelog_variants_full_match():
    for h in ["Changelog", "CHANGES", "Release Notes", "History",
              "change log", "What's New", "Versions"]:
        html = f"<h2>T</h2><p>fc</p><h2>{h}</h2><p>entries</p>"
        got = split_description_py(html)
        assert "entries" in got["changelog"], h
        assert "entries" not in got["main_content"], h
    # full-match only: 'Changelog Entries' / 'Changing the API' are NOT
    # changelog headings (reference CHANGELOG_PATTERNS are ^...$)
    for h in ["Changelog Entries", "Changing the API"]:
        got = split_description_py(f"<h2>T</h2><p>fc</p><h2>{h}</h2><p>x</p>")
        assert got["changelog"] == "", h


def test_split_strips_links_and_images_in_first_chapter():
    html = (
        '<h2>T</h2><p>see <a href="http://d">docs</a>'
        '<img src="http://badge.svg" alt=""> end.</p><h2>Next</h2><p>m</p>'
    )
    got = split_description_py(html)
    assert got["first_chapter"] == "<h2>T</h2><p>see docs end.</p>"
    # main_content keeps its markup untouched
    assert got["main_content"] == "<h2>Next</h2><p>m</p>"


def test_split_flattens_rst_sections():
    """RST-rendered HTML wraps content in <section>; boundaries must be
    detected across the wrappers and the wrappers dropped."""
    html = (
        '<h2 class="title">Top</h2><p>intro</p>'
        '<section id="usage"><h2>Usage</h2><p>use</p></section>'
        '<section id="history"><h2>History</h2><p>old</p></section>'
    )
    got = split_description_py(html)
    assert got["title"] == "Top"
    assert got["first_chapter"] == '<h2 class="title">Top</h2><p>intro</p>'
    assert got["main_content"] == "<h2>Usage</h2><p>use</p>"
    assert got["changelog"] == "<h2>History</h2><p>old</p>"


def test_split_rst_end_to_end():
    rst = (
        "Pkg\n===\n\nintro para\n\nUsage\n-----\n\nuse it\n\n"
        "Changelog\n---------\n\n- 1.0 first\n"
    )
    got = split_description_py(render_description_py(rst, None), "sum")
    assert got["title"] == "Pkg"
    assert got["first_chapter"].startswith("sum\n\n")
    assert "intro para" in got["first_chapter"]
    assert "use it" in got["main_content"]
    assert "1.0 first" in got["changelog"]


def test_split_no_headings_everything_first_chapter():
    got = split_description_py("<p>just prose</p>")
    assert got == {
        "title": "",
        "first_chapter": "<p>just prose</p>",
        "main_content": "",
        "changelog": "",
    }


def test_split_summary_prepends_to_first_chapter():
    """Reference adds summary to FIRST_CHAPTER (description_splitter
    .py:279-284), not main_content."""
    got = split_description_py("<h2>T</h2><p>fc</p>", "the summary")
    assert got["first_chapter"] == "the summary\n\n<h2>T</h2><p>fc</p>"
    assert split_description_py("", "only summary")["first_chapter"] == "only summary"


def test_strip_helpers():
    assert strip_links('<a href="x">keep</a> me') == "keep me"
    assert strip_images('a<img src="y">b') == "ab"


# ------------------------------------------------------------ spark + C7


def test_split_udf_matches_py(spark):
    from pyf_aggregator_spark.registry import REGISTRY

    fn, sql = REGISTRY["c5c6_description_split"]
    assert sql is None  # rows-only family
    rows = fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) >= 4
    by_id = {r["id"]: r for r in rows}
    assert by_id[1]["title"] == "Pkg One"
    assert by_id[2]["title"] == "Pkg Two"  # RST default path
    assert "old stuff" in by_id[2]["changelog"]


def test_badge_detection(spark):
    df = spark.createDataFrame(
        [(1, "https://img.shields.io/pypi/v/x.svg"),
         (2, "https://example.com/shot.png")],
        "id int, url string",
    )
    got = [r["id"] for r in df.filter(is_badge_url("url")).collect()]
    assert got == [1]
