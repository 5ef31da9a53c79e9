"""C5 — description → HTML rendering with content-type dispatch.

Mirrors the reference's rst_to_html plugin (rst_to_html.py:10-16
renderer dispatch, :21-70 heading demotion, :73-82 process): PyPI
descriptions declare a ``description_content_type`` and default to RST;
the renderer converts to HTML and demotes every heading one level
(h1→h2 … capped at h6) because the UI owns the page h1.

Renderers:
- ``text/x-rst`` / None / "" → docutils (the actual library behind
  PyPI's readme_renderer.rst), html5 writer → <section>-wrapped HTML,
  file insertion/raw disabled like readme_renderer's safe settings;
- ``text/markdown`` → an own CommonMark-subset renderer (ATX + setext
  headings, fenced code, lists, images/links, strong/em/code) — the
  markdown lib is not in this container and the subset covers README
  structure, which is all the splitter consumes;
- ``text/plain`` → escaped text in <pre>.

Runs as an Arrow-batched pandas UDF (per-doc branching on real
documents — the canonical non-SQL-expressible transform, SURVEY §2.7).
"""

from __future__ import annotations

import html as html_mod
import re

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

try:
    from docutils.core import publish_parts

    _HAVE_DOCUTILS = True
except Exception:  # pragma: no cover - docutils is present in this env
    _HAVE_DOCUTILS = False

_DOCUTILS_SETTINGS = {
    # readme_renderer-style safety: no file inclusion, no raw HTML
    # passthrough, never raise on malformed input
    "file_insertion_enabled": False,
    "raw_enabled": False,
    "report_level": 5,
    "halt_level": 5,
    "syntax_highlight": "none",
    "doctitle_xform": True,
    "initial_header_level": 1,
}

_ATX_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_SETEXT_RE = re.compile(r"^(=+|-+)\s*$")
_FENCE_RE = re.compile(r"^(```|~~~)")
_BULLET_RE = re.compile(r"^\s*[-*+]\s+(.*)$")
_ORDERED_RE = re.compile(r"^\s*\d{1,9}[.)]\s+(.*)$")


def _md_inline(text: str) -> str:
    """Inline markdown → HTML (escape first, then mark up)."""
    out = html_mod.escape(text, quote=False)
    out = re.sub(
        r"!\[([^\]]*)\]\(([^)\s]+)\)", r'<img src="\2" alt="\1">', out
    )
    out = re.sub(r"\[([^\]]+)\]\(([^)\s]+)\)", r'<a href="\2">\1</a>', out)
    out = re.sub(r"`([^`]+)`", r"<code>\1</code>", out)
    out = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", out)
    out = re.sub(r"(?<!\*)\*([^*\s][^*]*)\*(?!\*)", r"<em>\1</em>", out)
    return out


def md_to_html(text: str) -> str:
    """CommonMark-subset markdown → flat HTML (no section wrappers —
    like the reference's markdown path, which yields flat HTML that the
    splitter handles without flattening)."""
    lines = (text or "").splitlines()
    out: list[str] = []
    para: list[str] = []
    items: list[str] = []
    list_tag = "ul"
    i = 0

    def flush_para():
        if para:
            out.append("<p>" + _md_inline(" ".join(para)) + "</p>")
            para.clear()

    def flush_list():
        if items:
            out.append(
                f"<{list_tag}>"
                + "".join(f"<li>{x}</li>" for x in items)
                + f"</{list_tag}>"
            )
            items.clear()

    while i < len(lines):
        line = lines[i]
        if _FENCE_RE.match(line):
            flush_para()
            flush_list()
            fence = _FENCE_RE.match(line).group(1)
            block = []
            i += 1
            while i < len(lines) and not lines[i].startswith(fence):
                block.append(lines[i])
                i += 1
            out.append(
                "<pre><code>"
                + html_mod.escape("\n".join(block), quote=False)
                + "</code></pre>"
            )
            i += 1
            continue
        m = _ATX_RE.match(line)
        if m:
            flush_para()
            flush_list()
            lvl = len(m.group(1))
            out.append(f"<h{lvl}>{_md_inline(m.group(2))}</h{lvl}>")
            i += 1
            continue
        if (
            line.strip()
            and not _BULLET_RE.match(line)
            and i + 1 < len(lines)
            and _SETEXT_RE.match(lines[i + 1])
            and not para
            and not items
        ):
            lvl = 1 if lines[i + 1].lstrip().startswith("=") else 2
            out.append(f"<h{lvl}>{_md_inline(line.strip())}</h{lvl}>")
            i += 2
            continue
        b = _BULLET_RE.match(line) or _ORDERED_RE.match(line)
        if b:
            flush_para()
            tag = "ul" if _BULLET_RE.match(line) else "ol"
            if items and tag != list_tag:
                flush_list()  # list type changed mid-stream
            list_tag = tag
            items.append(_md_inline(b.group(1)))
            i += 1
            continue
        if not line.strip():
            flush_para()
            flush_list()
            i += 1
            continue
        para.append(line.strip())
        i += 1
    flush_para()
    flush_list()
    return "".join(out)


def rst_to_html(text: str) -> str:
    """RST → HTML fragment via docutils html5 writer (readme_renderer's
    engine): sections arrive wrapped in <section> elements, which the
    splitter flattens exactly like the reference (description_splitter
    .py:41-63)."""
    if not _HAVE_DOCUTILS:  # pragma: no cover
        return txt_to_html(text)
    try:
        parts = publish_parts(
            source=text or "",
            writer_name="html5",
            settings_overrides=dict(_DOCUTILS_SETTINGS),
        )
    except Exception:
        return txt_to_html(text)
    frag = parts.get("html_body") or parts.get("fragment") or ""
    # html_body wraps in <main>/<div class="document"> depending on
    # docutils version — strip one outer wrapper so the fragment starts
    # at content level (the splitter treats <section> as transparent)
    frag = re.sub(r"^\s*<(main|div)[^>]*>", "", frag.strip())
    frag = re.sub(r"</(main|div)>\s*$", "", frag)
    # docutils promotes a lone top-level title to <h1 class="title">
    return frag.strip()


def txt_to_html(text: str) -> str:
    return "<pre>" + html_mod.escape(text or "", quote=False) + "</pre>"


_RENDERERS = {
    None: rst_to_html,
    "": rst_to_html,
    "text/x-rst": rst_to_html,
    "text/markdown": md_to_html,
    "text/plain": txt_to_html,
}


def normalize_headings_py(html: str) -> str:
    """Demote every heading one level (h1→h2 … h6 stays h6) — the UI
    owns the page's h1 (rst_to_html.py:21-70)."""
    if not html:
        return html
    return re.sub(
        r"(</?h)([1-6])",
        lambda m: m.group(1) + str(min(int(m.group(2)) + 1, 6)),
        html,
    )


def render_description_py(description: str | None, content_type: str | None) -> str:
    """C5 end-to-end: content-type dispatch → HTML → heading demotion.
    Unknown content types fall back to RST, the PyPI default."""
    if description is None:
        return ""
    ct = (content_type or "").split(";")[0].strip().lower() or None
    renderer = _RENDERERS.get(ct, rst_to_html)
    return normalize_headings_py(renderer(description))


@pandas_udf(T.StringType())
def render_description_udf(
    description: pd.Series, content_type: pd.Series
) -> pd.Series:
    ct = content_type.where(content_type.notna(), None)
    return pd.Series(
        [
            render_description_py(d, c)
            for d, c in zip(description.where(description.notna(), None), ct)
        ]
    )


def process(identifier: str, data: dict) -> dict | None:
    """The reference's rst_to_html plugin entry point
    (rst_to_html.py:73-82 contract): render ``data['description']`` by
    its ``description_content_type`` and demote headings, mutating the
    dict in place. ``None`` description → no mutation at all (the
    reference returns early); empty string still renders (to empty).
    Driver-side single-doc path — the distributed path is
    render_description_udf."""
    description = data.get("description")
    if description is None:
        return data
    data["description"] = render_description_py(
        description, data.get("description_content_type")
    )
    return data
