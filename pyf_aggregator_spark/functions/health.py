"""Exact health-score formula as JVM-side column algebra.

Parity target: the reference's health scoring stack —
``plugins/health_score.py`` (recency 40 / docs 18-base+bonuses /
metadata 30, per-category problems+bonuses breakdown),
``enrichers/health_calculator.py:104-223`` (GitHub bonuses: stars ≤10,
activity ≤10, issue management ≤10; final ``min(100, base+bonus)``),
``plugins/screenshot_detector.py`` (badge filtering + min-width 200).

Everything is built from ``pyspark.sql.functions`` (whole-stage
codegen; no UDF): the screenshot detector runs as
``regexp_extract_all`` + higher-order ``exists`` over the ``<img …>``
tags, the project-urls scan as ``exists`` over ``arrays_zip``.

Engine-level deltas from the reference, documented:

- "now" is a parameter (the reference reads the wall clock,
  health_score.py:112 / health_calculator.py:268) so Spark, DuckDB
  and the golden tests agree byte-for-byte.
- ISO timestamps (legacy branch, health_score.py:105-107) count only
  when they carry an explicit offset (``Z`` / ``±HH:MM``): the
  reference subtracts an AWARE ``now``, so a naive ISO raises
  TypeError and lands in the same except-arm as a malformed one
  (health_score.py:132-134) — "no release timestamp".
- img tags use the fixture's attribute grammar (double-quoted
  ``src``/``width``/``style``); the reference parses with lxml.
- the detector's network fallback (screenshot_detector.py:99-123,
  fetch image → read width) is out: a distributed engine doesn't call
  out per row. Undeterminable width ⇒ not a screenshot, exactly the
  reference's behavior when the fetch fails.

Breakdown flattening (a DataFrame column can't hold the reference's
heterogeneous dict): per-category ``*_points`` ints, ``*_problems`` /
``*_bonuses`` pipe-joined strings in the reference's append order
(bonus dicts render ``reason:points``), GitHub bonus ints with 0 for
"key omitted from the breakdown" (health_calculator.py:207-214 only
adds keys when > 0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MIN_SCREENSHOT_WIDTH = 200  # screenshot_detector.py:42

# screenshot_detector.py:18-36 — the alternation, verbatim grammar
# (the generic "badge" fallback subsumes several, kept for parity).
BADGE_PATTERN = (
    r"shields\.io|img\.shields\.io|badge\.fury\.io|travis-ci\.(org|com)|"
    r"codecov\.io|coveralls\.io|circleci\.com|"
    r"github\.com/[^/]+/[^/]+/workflows/[^/]+\.svg|"
    r"github\.com/[^/]+/[^/]+/actions/workflows/[^/]+/badge|"
    r"readthedocs\.org/[^/]+/badge|pypi\.org/badges|"
    r"pypi\.python\.org/[^/]*badge|ci\.appveyor\.com|snyk\.io|"
    r"codacy\.com|sonarcloud\.io|badge"
)

# health_score.py:170-173 — github/gitlab repo-root rejection, applied
# to the lowercased url (so no (?i) here).
_REPO_ROOT = r"^https?://(www\.)?(github|gitlab)\.(com|io)/[^/]+/[^/]+(/?|#.*)$"

_NOT_ENOUGH_DOCS = (
    "not enough documentation (extend README to 500+ words or add"
    " documentation link)"
)


def meaningful_docs_url(url: Column) -> Column:
    """health_score.py:147-177 — False for empty, PyPI detail pages,
    and GitHub/GitLab repo roots (incl. #anchor); True otherwise."""
    low = F.lower(url)
    return (
        url.isNotNull()
        & (url != "")
        & ~low.contains("pypi.org/project/")
        & ~low.rlike(_REPO_ROOT)
    )


def word_count(text: Column) -> Column:
    """health_score.py:8-12 — ``len(text.split())``."""
    t = F.trim(text)
    return F.when(text.isNull() | (t == ""), F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def _img_width(tag: Column) -> Column:
    """screenshot_detector.py:126-159 — width attr first (strip a
    trailing px, int-parse; unparseable falls through), then the CSS
    style width. The fetch fallback is engine-absent (module doc).

    Attribute extraction anchors on a non-name char (``(?:^|[^\\w-])``)
    so ``data-width="..."`` is NOT the width attribute — the reference
    reads attributes through lxml (``img_element.get("width")``), which
    never confuses prefixed attribute names. The CSS regex deliberately
    stays UNanchored: the reference's own ``parse_width_from_style``
    (screenshot_detector.py:72, ``re.search(r"width\\s*:...")``) matches
    inside ``max-width:`` too, and we mirror that exactly."""
    attr = F.regexp_extract(tag, r'(?:^|[^\w-])width="([^"]*)"', 1)
    attr_val = F.trim(F.regexp_replace(attr, r"[px]+$", "")).try_cast("int")
    style = F.regexp_extract(tag, r'(?:^|[^\w-])style="([^"]*)"', 1)
    style_val = F.regexp_extract(
        style, r"(?i)width\s*:\s*(\d+)(?:px)?", 1
    ).try_cast("int")
    return F.coalesce(attr_val, style_val)


def has_screenshots(description: Column) -> Column:
    """screenshot_detector.py:162-216 — any img with a non-empty,
    non-badge src and a determinable width ≥ 200."""
    tags = F.regexp_extract_all(description, F.lit(r"<img[^>]*>"), 0)

    def _qualifies(tag: Column) -> Column:
        src = F.regexp_extract(tag, r'(?:^|[^\w-])src="([^"]*)"', 1)
        w = _img_width(tag)
        return (
            (src != "")
            & ~src.rlike("(?i)" + BADGE_PATTERN)
            & w.isNotNull()
            & (w >= MIN_SCREENSHOT_WIDTH)
        )

    return description.isNotNull() & F.exists(tags, _qualifies)


def health_scores(df: DataFrame, now_ts: int) -> DataFrame:
    """Full enhanced health score over a health-doc-shaped frame.

    Input schema = fixtures.health.SCHEMA (the reference's package
    document at scoring time, dict → columns; NULL scalar = key absent
    from the doc). Output = one row per doc with the flattened
    breakdown described in the module doc. Scale shape: pure
    row-parallel column algebra — no shuffle, no UDF; at 100 TB this
    pipelines into whatever scan/write surrounds it.
    """
    now = F.lit(now_ts).cast("long")

    # ---- recency (health_score.py:78-134) --------------------------
    # upload_ts models the int branch (0 ⇒ missing), upload_iso the
    # legacy string branch (aware-offset grammar only, module doc).
    iso_ok = F.col("upload_iso").rlike(r"(Z|[+-]\d{2}:\d{2})$")
    iso_sec = F.unix_timestamp(F.col("upload_iso").try_cast("timestamp"))
    up_sec = F.when(
        F.col("upload_ts").isNotNull() & (F.col("upload_ts") != 0),
        F.col("upload_ts"),
    ).when(F.col("upload_iso").isNotNull() & iso_ok, iso_sec)
    # timedelta.days floors toward -inf; floor() on the seconds ratio
    # matches for either sign.
    age_days = F.floor((now - up_sec) / F.lit(86400.0))

    recency_points = (
        F.when(up_sec.isNull(), 0)
        .when(age_days < 180, 40)
        .when(age_days < 365, 30)
        .when(age_days < 730, 20)
        .when(age_days < 1095, 10)
        .when(age_days < 1825, 5)
        .otherwise(0)
    )
    recency_base_problem = (
        F.when(up_sec.isNull(), "no release timestamp")
        .when(age_days < 180, F.lit(None).cast("string"))
        .when(age_days < 365, "last release over 6 months ago")
        .when(age_days < 730, "last release over 1 year ago")
        .when(age_days < 1095, "last release over 2 years ago")
        .when(age_days < 1825, "last release over 3 years ago")
        .otherwise("last release over 5 years ago")
    )

    # ---- documentation (health_score.py:180-252) --------------------
    has_docs_url = meaningful_docs_url(F.col("docs_url"))
    desc_ok = F.col("description").isNotNull() & (
        F.length("description") > 150
    )
    # project_urls scan (health_score.py:214-229): any key containing
    # a doc keyword whose url is meaningful ("home" ⊂ "homepage", so
    # three alternatives suffice).
    pairs = F.arrays_zip(
        F.coalesce("purl_keys", F.array()).alias("k"),
        F.coalesce("purl_vals", F.array()).alias("v"),
    )
    has_purl = F.exists(
        pairs,
        lambda kv: F.lower(kv["k"]).rlike("(documentation|docs|home)")
        & meaningful_docs_url(kv["v"]),
    )
    readme_words = word_count(F.col("first_chapter")) + word_count(
        F.col("main_content")
    )
    screens = has_screenshots(F.col("description"))

    docs_points = (
        F.when(has_docs_url, 4).otherwise(0)
        + F.when(desc_ok, 18).otherwise(0)
        + F.when(has_purl, 3).otherwise(0)
        + F.when(screens, 5).otherwise(0)
    )
    docs_problems = F.concat_ws(
        "|",
        F.when(~desc_ok, "description too short (<150 chars)"),
        F.when(
            (readme_words < 500) & ~has_docs_url & ~has_purl,
            _NOT_ENOUGH_DOCS,
        ),
    )
    docs_bonuses = F.concat_ws(
        "|",
        F.when(has_docs_url, "has dedicated docs URL:4"),
        F.when(has_purl, "has documentation project URL:3"),
        F.when(screens, "has meaningful screenshots:5"),
    )

    # ---- metadata (health_score.py:265-311) -------------------------
    has_maint = F.col("maintainer").isNotNull() & (F.col("maintainer") != "")
    has_author = F.col("author").isNotNull() & (F.col("author") != "")
    has_license = F.col("license").isNotNull() & (F.col("license") != "")
    is_npm = F.coalesce(F.col("registry"), F.lit("pypi")) == "npm"
    n_class = F.size(F.coalesce("classifiers", F.array()))
    n_kw = F.size(F.coalesce("keywords", F.array()))
    class_ok = F.when(is_npm, n_kw >= 3).otherwise(n_class >= 3)

    metadata_points = (
        F.when(has_maint | has_author, 10).otherwise(0)
        + F.when(has_license, 10).otherwise(0)
        + F.when(class_ok, 10).otherwise(0)
    )
    metadata_problems = F.concat_ws(
        "|",
        F.when(~(has_maint | has_author), "no maintainer info"),
        F.when(~(has_maint | has_author), "no author info"),
        F.when(~has_license, "no license"),
        F.when(
            ~class_ok,
            F.when(is_npm, "fewer than 3 keywords").otherwise(
                "fewer than 3 classifiers"
            ),
        ),
    )

    # ---- GitHub bonuses (health_calculator.py:142-224) --------------
    stars = F.col("github_stars")
    stars_truthy = stars.isNotNull() & (stars != 0)
    stars_bonus = F.when(
        stars_truthy,
        F.when(stars >= 1000, 10)
        .when(stars >= 500, 7)
        .when(stars >= 100, 5)
        .when(stars >= 50, 3)
        .when(stars >= 10, 1)
        .otherwise(0),
    ).otherwise(0)

    gu = F.col("github_updated")
    gu_truthy = gu.isNotNull() & (gu != 0)
    # health_calculator.py:268-271: float days, no floor.
    act_age = (now - gu) / F.lit(86400.0)
    activity_bonus = F.when(
        gu_truthy,
        F.when(act_age < 30, 10)
        .when(act_age < 90, 7)
        .when(act_age < 180, 5)
        .when(act_age < 365, 3)
        .otherwise(0),
    ).otherwise(0)
    activity_problem = F.when(
        gu_truthy & (activity_bonus == 0), "no GitHub activity in 1+ year"
    ).when(
        gu_truthy & (activity_bonus <= 3), "limited GitHub activity (6+ months)"
    )

    # Issue bonus gate (health_calculator.py:170-177): BOTH keys
    # present in the doc (non-null columns) and stars > 0.
    oi = F.col("github_open_issues")
    issue_applicable = oi.isNotNull() & stars.isNotNull() & (stars > 0)
    ratio = oi / stars
    issue_bonus = F.when(
        issue_applicable,
        F.when(ratio < 0.1, 10)
        .when(ratio < 0.3, 7)
        .when(ratio < 0.5, 5)
        .when(ratio < 1.0, 3)
        .otherwise(0),
    ).otherwise(0)
    metadata_bonuses = F.concat_ws(
        "|", F.when(issue_bonus >= 5, "good issue management")
    )

    recency_problems = F.concat_ws("|", recency_base_problem, activity_problem)
    github_total = stars_bonus + activity_bonus + issue_bonus
    base = recency_points + docs_points + metadata_points
    health = F.least(F.lit(100), base + github_total)

    return df.select(
        "name",
        health.cast("int").alias("health_score"),
        recency_points.cast("int").alias("recency_points"),
        docs_points.cast("int").alias("docs_points"),
        metadata_points.cast("int").alias("metadata_points"),
        recency_problems.alias("recency_problems"),
        docs_problems.alias("docs_problems"),
        metadata_problems.alias("metadata_problems"),
        docs_bonuses.alias("docs_bonuses"),
        metadata_bonuses.alias("metadata_bonuses"),
        stars_bonus.cast("int").alias("stars_bonus"),
        activity_bonus.cast("int").alias("activity_bonus"),
        issue_bonus.cast("int").alias("issue_bonus"),
        github_total.cast("int").alias("github_bonus_total"),
    ).orderBy("name")
