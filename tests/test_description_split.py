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
              "What's New", "Versions"]:
        html = f"<h2>T</h2><p>fc</p><h2>{h}</h2><p>entries</p>"
        got = split_description_py(html)
        assert "entries" in got["changelog"], h
        assert "entries" not in got["main_content"], h
    # full-match only: 'Changelog Entries' / 'Changing the API' are NOT
    # changelog headings (reference CHANGELOG_PATTERNS are ^...$), and
    # 'change log' / 'release note' miss the reference's exact
    # patterns (changelog is one word; notes is plural-only)
    for h in ["Changelog Entries", "Changing the API", "change log",
              "Release Note"]:
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


# ------------------------------------------------ round-3 golden breadth
# Behavior parity with the reference's expected-output tables
# (tests/test_description_splitter.py:279-1067, tests/test_rst_to_html
# .py:70-319) on freshly-written fixtures.

# ---- title extraction


def test_title_is_plain_text_inside_markup():
    got = split_description_py(
        "<h2>Name with <strong>emphasis</strong> inside</h2><p>c</p>"
    )
    assert got["title"] == "Name with emphasis inside"
    assert "<" not in got["title"]


def test_title_whitespace_stripped():
    got = split_description_py("<h2>   Padded Name \n</h2><p>c</p>")
    assert got["title"] == "Padded Name"


def test_title_multiple_h2_uses_first():
    got = split_description_py("<h2>First</h2><p>a</p><h2>Second</h2><p>b</p>")
    assert got["title"] == "First"


# ---- first chapter / main content boundaries


def test_single_heading_all_in_first_chapter_main_empty():
    got = split_description_py("<h2>Only</h2><p>alpha</p><p>beta</p>")
    assert got["first_chapter"] == "<h2>Only</h2><p>alpha</p><p>beta</p>"
    assert got["main_content"] == ""
    assert got["changelog"] == ""


def test_main_content_spans_middle_sections():
    got = split_description_py(
        "<h2>T</h2><p>fcbody</p><h2>Install</h2><p>instbody</p>"
        "<h2>Usage</h2><p>usebody</p><h2>History</h2><p>histbody</p>"
    )
    assert "Install" in got["main_content"] and "Usage" in got["main_content"]
    assert "fcbody" not in got["main_content"]
    assert "histbody" not in got["main_content"]


def test_starts_with_text_and_changelog():
    got = split_description_py(
        "<p>lead-in text</p><h2>Docs</h2><p>d</p><h2>Changes</h2><p>c</p>"
    )
    assert got["title"] == "Docs"
    assert got["first_chapter"] == "<p>lead-in text</p>"
    assert got["main_content"] == "<h2>Docs</h2><p>d</p>"
    assert got["changelog"] == "<h2>Changes</h2><p>c</p>"


def test_only_changelog_after_intro_main_empty():
    got = split_description_py(
        "<h2>T</h2><p>intro</p><h2>Changelog</h2><p>entries</p>"
    )
    assert got["main_content"] == ""
    assert "entries" in got["changelog"]


# ---- heading levels beyond h2


def test_h4_only_title_and_split():
    got = split_description_py("<h4>Quiet Pkg</h4><p>a</p><h4>Next</h4><p>b</p>")
    assert got["title"] == "Quiet Pkg"
    assert got["first_chapter"] == "<h4>Quiet Pkg</h4><p>a</p>"
    assert got["main_content"] == "<h4>Next</h4><p>b</p>"


def test_mixed_h4_h5_split_at_second_heading():
    got = split_description_py("<h4>Top</h4><p>a</p><h5>Sub</h5><p>b</p>")
    assert got["title"] == "Top"
    assert got["first_chapter"] == "<h4>Top</h4><p>a</p>"
    assert got["main_content"] == "<h5>Sub</h5><p>b</p>"


def test_h1_title_splits_at_h2():
    got = split_description_py("<h1>Big</h1><p>a</p><h2>Small</h2><p>b</p>")
    assert got["title"] == "Big"
    assert got["first_chapter"] == "<h1>Big</h1><p>a</p>"
    assert got["main_content"] == "<h2>Small</h2><p>b</p>"


def test_h3_and_h6_changelog_detected():
    got3 = split_description_py(
        "<h2>T</h2><p>i</p><h2>More</h2><p>m</p><h3>Changelog</h3><p>c3</p>"
    )
    assert "c3" in got3["changelog"] and "c3" not in got3["main_content"]
    got6 = split_description_py(
        "<h2>T</h2><p>i</p><h2>More</h2><p>m</p><h6>History</h6><p>c6</p>"
    )
    assert "c6" in got6["changelog"]


def test_changelog_case_insensitive_and_subsections():
    got = split_description_py(
        "<h2>T</h2><p>i</p><h2>CHANGELOG</h2><h3>2.0</h3><p>newer</p>"
        "<h3>1.0</h3><p>older</p>"
    )
    assert got["changelog"] == (
        "<h2>CHANGELOG</h2><h3>2.0</h3><p>newer</p><h3>1.0</h3><p>older</p>"
    )


# ---- degenerate inputs


def test_none_empty_whitespace_inputs():
    for raw in (None, "", "   \n  "):
        got = split_description_py(raw)
        assert got == {
            "title": "", "first_chapter": "", "main_content": "",
            "changelog": "",
        }, repr(raw)


def test_unclosed_element_kept():
    got = split_description_py("<p>never closed")
    assert "never closed" in got["first_chapter"]


def test_bare_top_level_text_dropped():
    got = split_description_py("loose text<p>kept</p>")
    assert got["first_chapter"] == "<p>kept</p>"


# ---- section flattening depth


def test_deeply_nested_sections_flatten():
    got = split_description_py(
        "<section><section><h2>Deep Title</h2><p>fc</p></section>"
        "<section><section><h2>Inner Usage</h2><p>u</p></section></section>"
        "</section>"
    )
    assert got["title"] == "Deep Title"
    assert got["first_chapter"] == "<h2>Deep Title</h2><p>fc</p>"
    assert got["main_content"] == "<h2>Inner Usage</h2><p>u</p>"


def test_single_section_all_first_chapter():
    got = split_description_py(
        '<section id="one"><h2>Solo</h2><p>body</p></section>'
    )
    assert got["first_chapter"] == "<h2>Solo</h2><p>body</p>"
    assert got["main_content"] == ""


# ---- strip helpers, edge grid


def test_strip_images_variants():
    assert strip_images('x<img src="a.png">y<img alt="b" src="b.png">z') == "xyz"
    assert strip_images('<img src="a" width="20" data-x="1">') == ""
    assert strip_images("") == ""
    assert strip_images(None) == ""
    assert strip_images("<p>keep <em>tags</em></p>") == "<p>keep <em>tags</em></p>"


def test_strip_links_variants():
    assert strip_links('<a href="u">one</a> <a id="z">two</a>') == "one two"
    assert strip_links('<a href="u"><em>styled</em> text</a>') == "<em>styled</em> text"
    assert strip_links("") == ""
    assert strip_links(None) == ""
    assert strip_links("<p>no links</p>") == "<p>no links</p>"


def test_changelog_and_main_keep_links_and_images():
    got = split_description_py(
        '<h2>T</h2><p>fc <a href="x">l</a></p>'
        '<h2>Mid</h2><p><a href="m">mlink</a><img src="mi.png"></p>'
        '<h2>History</h2><p><a href="c">clink</a><img src="ci.png"></p>'
    )
    assert "<a" not in got["first_chapter"] and "<img" not in got["first_chapter"]
    assert '<a href="m">mlink</a>' in got["main_content"]
    assert '<img src="mi.png">' in got["main_content"]
    assert '<a href="c">clink</a>' in got["changelog"]
    assert '<img src="ci.png">' in got["changelog"]


def test_multiple_links_in_first_chapter_all_stripped():
    got = split_description_py(
        '<p><a href="1">a</a> mid <a href="2">b</a> end</p><h2>N</h2><p>m</p>'
    )
    assert got["first_chapter"] == "<p>a mid b end</p>"


# ---- summary prepend rules


def test_summary_with_starts_with_text():
    got = split_description_py("<p>intro</p><h2>T</h2><p>m</p>", "a summary")
    assert got["first_chapter"] == "a summary\n\n<p>intro</p>"


def test_summary_with_none_description():
    got = split_description_py(None, "just the summary")
    assert got["first_chapter"] == "just the summary"
    assert got["title"] == ""


# ---- heading normalization (C5)


def test_normalize_none_and_empty_passthrough():
    assert normalize_headings_py(None) is None
    assert normalize_headings_py("") == ""


def test_normalize_preserves_attributes_and_nesting():
    got = normalize_headings_py(
        '<h1 id="top" class="t">A</h1><div><h2 data-k="v">B</h2></div>'
    )
    assert got == '<h2 id="top" class="t">A</h2><div><h3 data-k="v">B</h3></div>'


def test_normalize_shifts_every_level_once():
    got = normalize_headings_py(
        "<h1>a</h1><h2>b</h2><h3>c</h3><h4>d</h4><h5>e</h5><h6>f</h6>"
    )
    assert got == (
        "<h2>a</h2><h3>b</h3><h4>c</h4><h5>d</h5><h6>e</h6><h6>f</h6>"
    )


def test_normalize_without_headings_unchanged():
    s = "<p>h1-free body with <code>h1</code> text</p>"
    assert normalize_headings_py(s) == s


# ---- render integration (C5 end-to-end)


def test_rst_multiple_titles_full_conversion():
    rst = (
        "Alpha\n=====\n\nintro paragraph\n\nBeta\n----\n\n- item one\n"
        "- item two\n\nGamma\n-----\n\nfinal words\n"
    )
    html = render_description_py(rst, "text/x-rst")
    assert "<h1" not in html  # demoted
    got = split_description_py(html)
    assert got["title"] == "Alpha"
    assert "intro paragraph" in got["first_chapter"]
    assert "item one" in got["main_content"]
    assert "final words" in got["main_content"]


def test_markdown_render_none_and_empty():
    assert render_description_py(None, "text/markdown") == ""
    assert render_description_py("", "text/markdown") == ""


def test_markdown_lists_and_paragraphs_preserved_through_split():
    md = "# Pkg\n\nlead para\n\n## Use\n\n- do this\n- then that\n"
    got = split_description_py(render_description_py(md, "text/markdown"))
    assert got["title"] == "Pkg"
    assert "lead para" in got["first_chapter"]
    assert "<li>do this</li>" in got["main_content"]


def test_unknown_content_type_falls_back_to_rst():
    html = render_description_py("Zed\n===\n\nbody\n", "application/unknown")
    got = split_description_py(html)
    assert got["title"] == "Zed"


# ------------------------------------------------- round-4 golden additions
# (porting the remaining behavior classes of the reference's expected-
# output tables: edge cases, strip-helper contracts, per-field markup
# preservation, nested-section real-world shapes, demotion attributes)


def test_split_none_empty_whitespace_all_empty():
    """None / '' / whitespace-only descriptions → every field empty
    (reference TestEdgeCases)."""
    for desc in (None, "", "   \n\t  "):
        got = split_description_py(desc)
        assert got == {
            "title": "", "first_chapter": "", "main_content": "",
            "changelog": "",
        }, repr(desc)


def test_split_complex_structure_golden():
    """The reference's complex fixture shape (plone.api): lists + code
    blocks across 4 sections with a multi-version changelog."""
    html = (
        "<h2>plone.api</h2><p>A simple API to access functionality.</p>"
        "<ul><li>Easy to use</li><li>Well documented</li></ul>"
        "<h2>Installation</h2><p>Run: <code>pip install plone.api</code></p>"
        "<h2>Usage</h2><pre><code>from plone import api</code></pre>"
        "<h2>Changelog</h2><h3>2.0.0</h3><ul><li>Major release</li></ul>"
        "<h3>1.0.0</h3><ul><li>Initial release</li></ul>"
    )
    got = split_description_py(html)
    assert got["title"] == "plone.api"
    assert "simple API" in got["first_chapter"]
    assert "<li>Easy to use</li>" in got["first_chapter"]
    assert "pip install" in got["main_content"]
    assert "from plone import api" in got["main_content"]
    assert "Major release" in got["changelog"]
    assert "Initial release" in got["changelog"]
    assert "Major release" not in got["main_content"]


def test_split_nested_section_realworld_example():
    """The reference's real-world nested-section case (iMio news): title
    from the inner h3, section wrappers dropped everywhere."""
    html = (
        '<section id="imio-news-core"><h3>imio.news.core</h3>'
        "<p>Core product for iMio news websites</p>"
        '<section id="features"><h4>Features</h4>'
        "<ul><li>Can be used...</li></ul></section></section>"
    )
    got = split_description_py(html)
    assert got["title"] == "imio.news.core"
    assert "<h3>imio.news.core</h3>" in got["first_chapter"]
    assert "Core product for iMio news websites" in got["first_chapter"]
    assert "<section" not in got["first_chapter"]
    assert "Features" in got["main_content"]
    assert "<section" not in got["main_content"]


def test_split_deeply_nested_sections():
    """Three levels of <section> nesting: boundaries seen through every
    wrapper, content split at the SECOND heading."""
    html = (
        '<section id="outer"><h2>Outer Title</h2><p>Outer intro.</p>'
        '<section id="middle"><h3>Middle Section</h3><p>Middle content.</p>'
        '<section id="inner"><h4>Inner Section</h4><p>Inner content.</p>'
        "</section></section></section>"
    )
    got = split_description_py(html)
    assert got["title"] == "Outer Title"
    assert "Outer intro." in got["first_chapter"]
    assert "Middle content." in got["main_content"]
    assert "Inner content." in got["main_content"]
    assert "<section" not in got["main_content"]


def test_split_single_section_all_first_chapter():
    html = (
        '<section id="simple-package"><h3>Simple Package</h3>'
        "<p>This is a simple package with no sub-sections.</p>"
        "<p>Just some paragraphs of content.</p></section>"
    )
    got = split_description_py(html)
    assert got["title"] == "Simple Package"
    assert "no sub-sections" in got["first_chapter"]
    assert "Just some paragraphs" in got["first_chapter"]
    assert got["main_content"] == "" and got["changelog"] == ""


def test_split_main_content_preserves_images_and_links():
    """Stripping is a FIRST-CHAPTER rule only: main_content keeps <img>,
    main_content and changelog keep <a href> (reference
    TestLinkStrippingInFirstChapter)."""
    html = (
        "<h2>T</h2><p>Introduction.</p>"
        '<h2>Installation</h2><p>Screenshot: <img src="screenshot.png" '
        'alt="screenshot"> and <a href="https://pypi.org">PyPI</a>.</p>'
        '<h2>Changelog</h2><p>See <a href="https://github.com">GitHub</a>.</p>'
    )
    got = split_description_py(html)
    assert '<img src="screenshot.png"' in got["main_content"]
    assert 'href="https://pypi.org"' in got["main_content"]
    assert 'href="https://github.com"' in got["changelog"]


def test_split_multiple_links_stripped_text_in_context():
    html = (
        "<h2>Package</h2>"
        '<p><a href="a">One</a>, <a href="b">Two</a>, <a href="c">Three</a>'
        ' — please visit <a href="x">our documentation</a> for more info.</p>'
    )
    got = split_description_py(html)
    fc = got["first_chapter"]
    assert "<a" not in fc and "href" not in fc
    assert "One, Two, Three" in fc
    assert "please visit our documentation for more info." in fc


def test_split_starts_with_text_badge_image_stripped():
    """Text-before-first-heading first chapters strip images too (the
    classic badge-paragraph README opening)."""
    html = (
        "<p>This is an helper package for something.</p>"
        '<p><img src="badge.png" alt="badge"></p>'
        "<h3>Features</h3><p>Feature list here.</p>"
        "<h3>Installation</h3><p>Install instructions.</p>"
    )
    got = split_description_py(html)
    assert "<img" not in got["first_chapter"]
    assert "badge.png" not in got["first_chapter"]
    assert "helper package" in got["first_chapter"]
    assert got["title"] == "Features"  # first heading names the doc
    assert got["main_content"].startswith("<h3>Features</h3>")


def test_split_rst_section_first_chapter_links_stripped():
    html = (
        '<section id="pkg"><h3>Package</h3>'
        '<p>See <a href="x">docs</a> for usage.</p>'
        '<section id="install"><h4>Install</h4><p>pip.</p></section></section>'
    )
    got = split_description_py(html)
    assert "<a" not in got["first_chapter"]
    assert "See docs for usage." in got["first_chapter"]


def test_strip_images_contract():
    assert strip_images("") == ""
    assert strip_images(None) == ""  # ours: column-safe '' (ref: None)
    got = strip_images('<p><img src="a.png"> and <img src="b.png"></p>')
    assert "<img" not in got and "and" in got
    got = strip_images(
        '<img src="test.jpg" alt="Test" width="100" height="50" class="badge">'
    )
    assert got == ""
    got = strip_images('<p><strong>Bold</strong> and <img src="x.png"></p>')
    assert "<strong>Bold</strong>" in got and "<img" not in got


def test_strip_links_contract():
    assert strip_links("") == ""
    assert strip_links(None) == ""  # ours: column-safe '' (ref: None)
    assert strip_links('<a href="https://example.com">Click here</a>') == "Click here"
    got = strip_links('<p><a href="a">First</a> and <a href="b">Second</a></p>')
    assert "First and Second" in got and "<a" not in got
    # nested markup inside the anchor survives, only the <a> shell drops
    got = strip_links('<a href="x"><strong>Bold link</strong></a>')
    assert got == "<strong>Bold link</strong>"
    got = strip_links('<p><strong>Bold</strong> and <a href="x">link</a></p>')
    assert "<strong>Bold</strong>" in got and "link" in got and "<a" not in got


# ------------------------------------------------------- demotion goldens


def test_demote_multiple_h1_all_become_h2():
    got = normalize_headings_py("<h1>One</h1><h1>Two</h1><h1>Three</h1>")
    assert got == "<h2>One</h2><h2>Two</h2><h2>Three</h2>"


def test_demote_preserves_attributes():
    got = normalize_headings_py(
        '<h1 id="main-title" class="title">Title</h1><h1 id="section">S</h1>'
    )
    assert 'id="main-title"' in got and 'class="title"' in got
    assert 'id="section"' in got
    assert "<h1" not in got and got.count("<h2") == 2


def test_demote_preserves_non_heading_elements():
    html = (
        "<h1>Title</h1><p>Paragraph</p><ul><li>Item</li></ul>"
        "<h1>Section</h1><div>Content</div>"
    )
    got = normalize_headings_py(html)
    assert "<p>Paragraph</p>" in got
    assert "<li>Item</li>" in got
    assert "<div>Content</div>" in got
    assert "<h1" not in got


def test_demote_nested_structure_all_levels():
    html = (
        "<h1>Main Title</h1><h2>Subtitle</h2><h1>Second Section</h1>"
        "<h2>Second Subtitle</h2><h3>Nested Item</h3>"
    )
    got = normalize_headings_py(html)
    assert "<h2>Main Title</h2>" in got
    assert "<h3>Subtitle</h3>" in got
    assert "<h2>Second Section</h2>" in got
    assert "<h3>Second Subtitle</h3>" in got
    assert "<h4>Nested Item</h4>" in got


def test_demote_heading_entities_preserved():
    got = normalize_headings_py("<h1>Special Characters: &amp; &lt; &gt;</h1>")
    assert got == "<h2>Special Characters: &amp; &lt; &gt;</h2>"


def test_demote_no_headings_unchanged():
    html = "<p>Just a paragraph</p><div>And a div</div>"
    assert normalize_headings_py(html) == html
    assert normalize_headings_py("") == ""
    assert normalize_headings_py(None) is None


def test_demote_whitespace_html():
    got = normalize_headings_py("\n<h1>Title</h1>\n<p>Content</p>\n<h1>S</h1>\n")
    assert "<h2>Title</h2>" in got and "<h2>S</h2>" in got
    assert "<h1" not in got


def test_rst_full_conversion_multiple_titles():
    """Multi-title RST through the full render: docutils sectioning +
    demotion — no h1 survives, list/paragraph content preserved."""
    rst = (
        "Project Name\n============\n\nThis is the project description.\n\n"
        "Features\n========\n\n* Feature 1\n* Feature 2\n\n"
        "Installation\n============\n\nRun pip install.\n"
    )
    html = render_description_py(rst, "text/x-rst")
    assert "<h1" not in html
    assert html.count("<h2") + html.count("<h3") >= 2
    assert "Feature 1" in html and "Feature 2" in html
    assert "Run pip install." in html
    got = split_description_py(html)
    assert got["title"] == "Project Name"
    assert "project description" in got["first_chapter"]
    assert "Feature 1" in got["main_content"]


# --- process() plugin wrapper (description_splitter.py:256-292 parity) ---


def test_process_adds_fields_to_data():
    """process() mutates the data dict in place with the four fields
    (reference test_adds_fields_to_data)."""
    from pyf_aggregator_spark.functions.description_split import process

    data = {"description": "<h2>Pkg</h2><p>Intro</p><h2>More</h2><p>Body</p>"}
    out = process("pkg", data)
    assert out is data
    assert data["title"] == "Pkg"
    assert "Intro" in data["first_chapter"]
    assert "Body" in data["main_content"]
    assert data["changelog"] == ""


def test_process_none_description_no_warning(caplog):
    import logging

    from pyf_aggregator_spark.functions.description_split import process

    with caplog.at_level(logging.WARNING):
        data = {"description": None}
        process("test-package", data)
    assert "first_chapter is empty" not in caplog.text
    assert "main_content is empty" not in caplog.text
    assert data["first_chapter"] == "" and data["title"] == ""


def test_process_empty_description_no_warning(caplog):
    """Empty/whitespace description never warns (reference
    test_warns_on_empty_first_chapter + test_no_warning_on_empty_...)."""
    import logging

    from pyf_aggregator_spark.functions.description_split import process

    with caplog.at_level(logging.WARNING):
        process("test-package", {"description": "", "summary": ""})
        process("test-package", {"description": "   \n  "})
    assert "is empty" not in caplog.text


def test_process_warns_on_empty_main_content(caplog):
    """Single-section description → main_content empty → warning with
    the package identifier (reference test_warns_on_empty_main_content
    + test_warning_includes_package_identifier)."""
    import logging

    from pyf_aggregator_spark.functions.description_split import process

    with caplog.at_level(logging.WARNING):
        process(
            "my-special-package",
            {"description": "<h2>Title</h2><p>Only intro.</p>"},
        )
    assert "main_content is empty" in caplog.text
    assert "my-special-package" in caplog.text
    assert "first_chapter is empty" not in caplog.text


def test_process_no_warning_when_sections_populated(caplog):
    import logging

    from pyf_aggregator_spark.functions.description_split import process

    with caplog.at_level(logging.WARNING):
        process(
            "ok-pkg",
            {"description": "<h2>T</h2><p>Intro</p><h2>More</h2><p>C</p>"},
        )
    assert "is empty" not in caplog.text


def test_process_warning_judged_before_summary_prepend(caplog):
    """A summary must not mask an empty-after-split section: the
    reference checks the raw split BEFORE prepending summary."""
    import logging

    from pyf_aggregator_spark.functions.description_split import process

    with caplog.at_level(logging.WARNING):
        data = {
            "description": "<h2>Title</h2><p>Intro only.</p>",
            "summary": "A fine summary",
        }
        process("masked-pkg", data)
    assert "main_content is empty" in caplog.text
    assert data["first_chapter"].startswith("A fine summary\n\n")


def test_process_summary_only_first_chapter():
    from pyf_aggregator_spark.functions.description_split import process

    data = {"description": None, "summary": "Just a summary"}
    process("s-pkg", data)
    assert data["first_chapter"] == "Just a summary"


def test_imio_news_core_example():
    """The reference's exact real-world RST-section regression case
    (test_description_splitter.py:820-847)."""
    html = """
    <section id="imio-news-core">
        <h3>imio.news.core</h3>
        <p>Core product for iMio news websites</p>
        <section id="features">
            <h4>Features</h4>
            <ul>
                <li>Can be used...</li>
            </ul>
        </section>
    </section>
    """
    got = split_description_py(html)
    assert got["title"] == "imio.news.core"
    assert "<h3>imio.news.core</h3>" in got["first_chapter"]
    assert "Core product for iMio news websites" in got["first_chapter"]
    assert "<section" not in got["first_chapter"]
    assert "Features" in got["main_content"]
    assert "<section" not in got["main_content"]


def test_render_process_plugin_contract():
    """rst_to_html plugin process() parity (rst_to_html.py:73-82 +
    reference TestProcess): renders by content type, demotes headings,
    mutates in place; None description untouched; empty renders."""
    from pyf_aggregator_spark.functions.description_render import (
        process as render_process,
    )

    data = {"description": "Title\n=====\n\nBody para.",
            "description_content_type": None}
    render_process("pkg", data)
    assert "<h2" in data["description"] and "<h1" not in data["description"]
    assert "Body para." in data["description"]

    md = {"description": "# Top\n\ntext", "description_content_type":
          "text/markdown"}
    render_process("pkg", md)
    assert "<h2" in md["description"] and "text" in md["description"]

    untouched = {"description": None}
    render_process("pkg", untouched)
    assert untouched == {"description": None}

    empty = {"description": ""}
    render_process("pkg", empty)
    assert empty["description"] == ""


def test_render_then_split_process_chain():
    """The reference chains the two plugins (rst_to_html BEFORE
    description_splitter, §2.10 order matters): the splitter consumes
    the rendered+demoted HTML the renderer left in data."""
    from pyf_aggregator_spark.functions.description_render import (
        process as render_process,
    )
    from pyf_aggregator_spark.functions.description_split import process

    data = {
        "description": (
            "My Pkg\n======\n\nIntro text.\n\nFeatures\n========\n\n"
            "* one\n\nChangelog\n=========\n\n1.0 initial\n"
        ),
        "description_content_type": None,
        "summary": "short summary",
    }
    render_process("my-pkg", data)
    process("my-pkg", data)
    assert data["title"] == "My Pkg"
    assert data["first_chapter"].startswith("short summary\n\n")
    assert "Intro text." in data["first_chapter"]
    assert "one" in data["main_content"]
    assert "1.0 initial" in data["changelog"]
