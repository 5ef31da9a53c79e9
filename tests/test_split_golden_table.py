"""Table-driven golden cases for C5/C6 — widening the expected-output
coverage toward the reference's tables (tests/test_description_splitter.py
1,067 LoC, tests/test_rst_to_html.py 319 LoC). Each row pins the FULL
four-field split (or a render/strip output) as an exact string."""

from __future__ import annotations

import pytest

from pyf_aggregator_spark.functions.description_render import (
    md_to_html,
    normalize_headings_py,
)
from pyf_aggregator_spark.functions.description_split import (
    split_description_py,
    strip_images,
    strip_links,
)

# ---------------------------------------------------------------- changelog
# heading-variant detection table (reference CHANGELOG_PATTERNS,
# description_splitter.py:27-34: ^changelog$, ^history$, ^changes$,
# ^release\s*notes$, ^what'?s\s*new$, ^versions?$, IGNORECASE) — every
# row is a full-equality split over the same skeleton.

_MATCHING = [
    "Changelog", "changelog", "CHANGELOG", "ChangeLog",
    "History", "history", "HISTORY",
    "Changes", "changes", "CHANGES",
    "Release Notes", "release notes", "RELEASE NOTES", "ReleaseNotes",
    "Release  Notes",  # \s* spans runs of whitespace
    "What's New", "what's new", "WHAT'S NEW", "Whats New", "WhatsNew",
    "Versions", "versions", "Version", "VERSION",
    " Changelog ",  # heading text is stripped before the match
]

_NON_MATCHING = [
    "Change Log",        # reference pattern is the single word
    "Release Note",      # plural-only in the reference
    "Changelog 1.0",     # anchored ^...$
    "The Changelog",
    "Version History",
    "New",
    "Changelog:",
    "What Is New",
]


@pytest.mark.parametrize("head", _MATCHING)
def test_changelog_variant_matches(head):
    html = f"<h2>T</h2><p>fc</p><h2>Use</h2><p>m</p><h2>{head}</h2><p>log</p>"
    got = split_description_py(html)
    assert got == {
        "title": "T",
        "first_chapter": "<h2>T</h2><p>fc</p>",
        "main_content": "<h2>Use</h2><p>m</p>",
        "changelog": f"<h2>{head}</h2><p>log</p>",
    }


@pytest.mark.parametrize("head", _NON_MATCHING)
def test_changelog_variant_rejected(head):
    html = f"<h2>T</h2><p>fc</p><h2>Use</h2><p>m</p><h2>{head}</h2><p>log</p>"
    got = split_description_py(html)
    assert got == {
        "title": "T",
        "first_chapter": "<h2>T</h2><p>fc</p>",
        "main_content": f"<h2>Use</h2><p>m</p><h2>{head}</h2><p>log</p>",
        "changelog": "",
    }


# ---------------------------------------------------------------- heading
# level matrix: the split treats h1..h6 uniformly as section markers
# (reference HEADING_TAGS), and the changelog heading's level need not
# match the title's.

@pytest.mark.parametrize("lvl", ["h1", "h2", "h3", "h4", "h5", "h6"])
def test_split_uniform_across_heading_levels(lvl):
    html = (
        f"<{lvl}>Top</{lvl}><p>a</p><{lvl}>Mid</{lvl}><p>b</p>"
        f"<{lvl}>History</{lvl}><p>c</p>"
    )
    got = split_description_py(html)
    assert got == {
        "title": "Top",
        "first_chapter": f"<{lvl}>Top</{lvl}><p>a</p>",
        "main_content": f"<{lvl}>Mid</{lvl}><p>b</p>",
        "changelog": f"<{lvl}>History</{lvl}><p>c</p>",
    }


@pytest.mark.parametrize(
    "t_lvl,c_lvl",
    [("h2", "h3"), ("h2", "h6"), ("h1", "h4"), ("h4", "h2"), ("h6", "h3")],
)
def test_split_mixed_levels_changelog_detected(t_lvl, c_lvl):
    html = (
        f"<{t_lvl}>T</{t_lvl}><p>fc</p>"
        f"<{c_lvl}>Changelog</{c_lvl}><ul><li>1.0</li></ul>"
    )
    got = split_description_py(html)
    assert got["title"] == "T"
    assert got["first_chapter"] == f"<{t_lvl}>T</{t_lvl}><p>fc</p>"
    assert got["main_content"] == ""
    assert got["changelog"] == (
        f"<{c_lvl}>Changelog</{c_lvl}><ul><li>1.0</li></ul>"
    )


# ---------------------------------------------------------------- strip
# link/image edge variants (reference TestStripLinks / TestStripImages)

@pytest.mark.parametrize(
    "raw,want",
    [
        ('<a href="http://x">t</a>', "t"),
        ('<p>go <a href="http://x">here</a> now</p>', "<p>go here now</p>"),
        ('<a href="#">a</a> and <a href="/b">b</a>', "a and b"),
        # nested markup inside the anchor is preserved
        ('<a href="http://x"><em>styled</em> text</a>', "<em>styled</em> text"),
        ('<a href="http://x" title="y" rel="nofollow">attrs</a>', "attrs"),
        # anchor with no href still unwraps
        ("<a name='top'>anchored</a>", "anchored"),
        ("", ""),
        ("<p>no links</p>", "<p>no links</p>"),
        # nested element entirely inside the link body
        ('<a href="u"><code>pip install x</code></a>', "<code>pip install x</code>"),
    ],
)
def test_strip_links_table(raw, want):
    assert strip_links(raw) == want


@pytest.mark.parametrize(
    "raw,want",
    [
        ('<img src="http://b.svg">', ""),
        ('<img src="http://b.svg"/>', ""),
        ('<p>a <img src="x" alt="badge"> b</p>', "<p>a  b</p>"),
        ('<img src="1"><img src="2"><img src="3">', ""),
        ("", ""),
        ("<p>text only</p>", "<p>text only</p>"),
        ('<img src="x" width="20" height="20" class="badge">', ""),
        # image inside a link: stripping images leaves the empty link
        ('<a href="u"><img src="b.svg"></a>', '<a href="u"></a>'),
    ],
)
def test_strip_images_table(raw, want):
    assert strip_images(raw) == want


# ---------------------------------------------------------------- split
# structure table: full four-field equality over composed shapes

_S = [
    # (id, html, summary, expected dict)
    (
        "text_then_single_heading",
        "<p>intro</p><h2>Only</h2><p>rest</p>",
        "",
        {
            "title": "Only",
            "first_chapter": "<p>intro</p>",
            "main_content": "<h2>Only</h2><p>rest</p>",
            "changelog": "",
        },
    ),
    (
        "heading_only_no_body",
        "<h2>Bare</h2>",
        "",
        {
            "title": "Bare",
            "first_chapter": "<h2>Bare</h2>",
            "main_content": "",
            "changelog": "",
        },
    ),
    (
        "two_bare_headings",
        "<h2>A</h2><h2>B</h2>",
        "",
        {
            "title": "A",
            "first_chapter": "<h2>A</h2>",
            "main_content": "<h2>B</h2>",
            "changelog": "",
        },
    ),
    (
        "changelog_first_heading_after_text",
        "<p>intro</p><h2>Changelog</h2><p>log</p>",
        "",
        {
            "title": "Changelog",
            "first_chapter": "<p>intro</p>",
            "main_content": "",
            "changelog": "<h2>Changelog</h2><p>log</p>",
        },
    ),
    (
        "summary_only_no_description",
        "",
        "just a summary",
        {
            "title": "",
            "first_chapter": "just a summary",
            "main_content": "",
            "changelog": "",
        },
    ),
    (
        "summary_prepended_with_blank_line",
        "<h2>T</h2><p>fc</p>",
        "the summary",
        {
            "title": "T",
            "first_chapter": "the summary\n\n<h2>T</h2><p>fc</p>",
            "main_content": "",
            "changelog": "",
        },
    ),
    (
        "section_wrappers_flattened",
        "<section><h2>T</h2><p>fc</p></section>"
        "<section><h2>Use</h2><p>m</p></section>",
        "",
        {
            "title": "T",
            "first_chapter": "<h2>T</h2><p>fc</p>",
            "main_content": "<h2>Use</h2><p>m</p>",
            "changelog": "",
        },
    ),
    (
        "nested_sections_flattened",
        "<section><h2>T</h2><p>a</p>"
        "<section><h3>Sub</h3><p>b</p></section></section>",
        "",
        {
            "title": "T",
            "first_chapter": "<h2>T</h2><p>a</p>",
            "main_content": "<h3>Sub</h3><p>b</p>",
            "changelog": "",
        },
    ),
    (
        "changelog_subsections_included_to_end",
        "<h2>T</h2><p>fc</p><h2>Changelog</h2>"
        "<h3>1.1</h3><p>one</p><h3>1.0</h3><p>zero</p>",
        "",
        {
            "title": "T",
            "first_chapter": "<h2>T</h2><p>fc</p>",
            "main_content": "",
            "changelog": "<h2>Changelog</h2><h3>1.1</h3><p>one</p>"
                         "<h3>1.0</h3><p>zero</p>",
        },
    ),
    (
        "middle_sections_all_in_main",
        "<h2>T</h2><p>fc</p><h2>A</h2><p>a</p><h2>B</h2><p>b</p>"
        "<h2>C</h2><p>c</p><h2>History</h2><p>h</p>",
        "",
        {
            "title": "T",
            "first_chapter": "<h2>T</h2><p>fc</p>",
            "main_content": "<h2>A</h2><p>a</p><h2>B</h2><p>b</p>"
                            "<h2>C</h2><p>c</p>",
            "changelog": "<h2>History</h2><p>h</p>",
        },
    ),
    (
        "lists_tables_pre_preserved",
        "<h2>T</h2><ul><li>x</li></ul><pre><code>pip install</code></pre>"
        "<h2>Use</h2><table><tr><td>1</td></tr></table>",
        "",
        {
            "title": "T",
            "first_chapter": "<h2>T</h2><ul><li>x</li></ul>"
                             "<pre><code>pip install</code></pre>",
            "main_content": "<h2>Use</h2><table><tr><td>1</td></tr></table>",
            "changelog": "",
        },
    ),
    (
        "heading_attributes_preserved",
        '<h2 id="t" class="x">T</h2><p>fc</p><h2 id="u">Use</h2><p>m</p>',
        "",
        {
            "title": "T",
            "first_chapter": '<h2 id="t" class="x">T</h2><p>fc</p>',
            "main_content": '<h2 id="u">Use</h2><p>m</p>',
            "changelog": "",
        },
    ),
    (
        "entities_preserved",
        "<h2>A &amp; B</h2><p>1 &lt; 2</p><h2>Use</h2><p>m</p>",
        "",
        {
            "title": "A & B",
            "first_chapter": "<h2>A &amp; B</h2><p>1 &lt; 2</p>",
            "main_content": "<h2>Use</h2><p>m</p>",
            "changelog": "",
        },
    ),
    (
        "first_chapter_badge_and_link_stripped_main_kept",
        '<p><img src="https://img.shields.io/b.svg"> see '
        '<a href="https://docs">docs</a></p><h2>T</h2>'
        '<p>keep <a href="x">this link</a> and <img src="y"></p>',
        "",
        {
            "title": "T",
            "first_chapter": "<p> see docs</p>",
            "main_content": '<h2>T</h2><p>keep <a href="x">this link</a> '
                            'and <img src="y"></p>',
            "changelog": "",
        },
    ),
    (
        "whitespace_between_elements_dropped",
        "<h2>T</h2>\n  <p>fc</p>\n<h2>Use</h2>\n<p>m</p>",
        "",
        {
            "title": "T",
            "first_chapter": "<h2>T</h2><p>fc</p>",
            "main_content": "<h2>Use</h2><p>m</p>",
            "changelog": "",
        },
    ),
    (
        "text_then_changelog_then_more",
        "<p>intro</p><h2>Versions</h2><p>v1</p><h2>After</h2><p>x</p>",
        "",
        {
            "title": "Versions",
            "first_chapter": "<p>intro</p>",
            "main_content": "",
            "changelog": "<h2>Versions</h2><p>v1</p><h2>After</h2><p>x</p>",
        },
    ),
    (
        "blockquote_and_code_in_first_chapter",
        "<h2>T</h2><blockquote><p>q</p></blockquote><p><code>x=1</code></p>"
        "<h2>Use</h2><p>m</p>",
        "",
        {
            "title": "T",
            "first_chapter": "<h2>T</h2><blockquote><p>q</p></blockquote>"
                             "<p><code>x=1</code></p>",
            "main_content": "<h2>Use</h2><p>m</p>",
            "changelog": "",
        },
    ),
    (
        "hr_between_sections_preserved",
        "<h2>T</h2><p>fc</p><hr><h2>Use</h2><p>m</p>",
        "",
        {
            "title": "T",
            "first_chapter": "<h2>T</h2><p>fc</p><hr>",
            "main_content": "<h2>Use</h2><p>m</p>",
            "changelog": "",
        },
    ),
]


@pytest.mark.parametrize(
    "html,summary,want", [(h, s, w) for _, h, s, w in _S],
    ids=[i for i, *_ in _S],
)
def test_split_structure_table(html, summary, want):
    assert split_description_py(html, summary) == want


# ---------------------------------------------------------------- render
# markdown → html golden rows (C5 dispatch), matching the reference's
# readme-renderer-then-normalize pipeline shape: h1 demoted to h2.

@pytest.mark.parametrize(
    "md,want",
    [
        ("*em* **strong**", "<p><em>em</em> <strong>strong</strong></p>"),
        ("1. a\n2. b", "<ol><li>a</li><li>b</li></ol>"),
        ("[t](http://x)", '<p><a href="http://x">t</a></p>'),
        ("![alt](http://i.png)", '<p><img src="http://i.png" alt="alt"></p>'),
        ("`code`", "<p><code>code</code></p>"),
        ("para one\n\npara two", "<p>para one</p><p>para two</p>"),
        ("## Already H2", "<h2>Already H2</h2>"),
        ("### H3 stays", "<h3>H3 stays</h3>"),
    ],
)
def test_md_render_table(md, want):
    assert md_to_html(md) == want


@pytest.mark.parametrize(
    "raw,want",
    [
        ("<h1>T</h1>", "<h2>T</h2>"),
        ("<h2>T</h2>", "<h3>T</h3>"),
        ("<h5>T</h5>", "<h6>T</h6>"),
        ("<h6>T</h6>", "<h6>T</h6>"),  # caps at h6
        ("<h1>A</h1><h1>B</h1>", "<h2>A</h2><h2>B</h2>"),
        ("<p>x</p>", "<p>x</p>"),
        (None, None),
        ("", ""),
    ],
)
def test_normalize_headings_table(raw, want):
    assert normalize_headings_py(raw) == want
