"""Exact health-score parity gates (C12 upgrade).

Three independent implementations must agree row-for-row on the
health_docs fixture:

1. the Spark column algebra (functions/health.py),
2. the DuckDB oracle replay (the registry row's SQL),
3. ``_reference_replay`` below — a pure-Python restatement of the
   reference's formulas written from plugins/health_score.py,
   enrichers/health_calculator.py:104-223 and
   plugins/screenshot_detector.py, with the two documented engine
   deltas (pinned NOW; no network width fetch — undeterminable ⇒ not
   a screenshot; aware-offset-only ISO grammar).

Plus hand-derived pins for the reference's published boundaries
(exact 180-day release age, 199 vs 200 px width, len==150
description, 499-word README, npm keywords branch, 100-point cap).
"""

from __future__ import annotations

import re

import duckdb
import pytest

from pyf_aggregator_spark.fixtures.health import (
    NOW_TS,
    ROWS,
    SCHEMA,
    health_docs_df,
)
from pyf_aggregator_spark.functions.health import BADGE_PATTERN

_FIELDS = [f.name for f in SCHEMA.fields]

_BADGE_RE = re.compile(BADGE_PATTERN, re.IGNORECASE)
_REPO_ROOT_RE = re.compile(
    r"^https?://(www\.)?(github|gitlab)\.(com|io)/[^/]+/[^/]+(/?|#.*)$"
)
_AWARE_RE = re.compile(r"(Z|[+-]\d{2}:\d{2})$")
_NOT_ENOUGH = (
    "not enough documentation (extend README to 500+ words or add"
    " documentation link)"
)


def _meaningful(url):
    # health_score.py:147-177
    if not url:
        return False
    low = url.lower()
    if "pypi.org/project/" in low:
        return False
    return not _REPO_ROOT_RE.match(low)


def _wc(text):
    # health_score.py:8-12
    return len(text.split()) if text else 0


def _img_width(tag):
    # screenshot_detector.py:126-159, sans network fetch. Attr names
    # anchor on a non-name char (lxml .get() never matches data-width);
    # the CSS width regex stays unanchored like the reference's own
    # parse_width_from_style (matches inside max-width too).
    m = re.search(r'(?:^|[^\w-])width="([^"]*)"', tag)
    if m and m.group(1):
        try:
            return int(m.group(1).rstrip("px").strip())
        except ValueError:
            pass
    m = re.search(r'(?:^|[^\w-])style="([^"]*)"', tag)
    if m:
        w = re.search(r"width\s*:\s*(\d+)(?:px)?", m.group(1), re.IGNORECASE)
        if w:
            return int(w.group(1))
    return None


def _has_screenshots(html):
    # screenshot_detector.py:162-216 over the fixture's attribute grammar
    if not html:
        return False
    for tag in re.findall(r"<img[^>]*>", html):
        m = re.search(r'(?:^|[^\w-])src="([^"]*)"', tag)
        src = m.group(1) if m else ""
        if not src or _BADGE_RE.search(src):
            continue
        w = _img_width(tag)
        if w is not None and w >= 200:
            return True
    return False


def _reference_replay(row):
    d = dict(zip(_FIELDS, row))

    # ---- recency (health_score.py:78-134)
    recency_problems = []
    up_sec = None
    if d["upload_ts"] is not None:
        if d["upload_ts"] != 0:
            up_sec = d["upload_ts"]
    elif d["upload_iso"] and _AWARE_RE.search(d["upload_iso"]):
        from datetime import datetime

        try:
            up_sec = int(
                datetime.fromisoformat(
                    d["upload_iso"].replace("Z", "+00:00")
                ).timestamp()
            )
        except ValueError:
            up_sec = None
    if up_sec is None:
        recency_points = 0
        recency_problems.append("no release timestamp")
    else:
        age = (NOW_TS - up_sec) // 86400
        for bound, pts, msg in [
            (180, 40, None),
            (365, 30, "last release over 6 months ago"),
            (730, 20, "last release over 1 year ago"),
            (1095, 10, "last release over 2 years ago"),
            (1825, 5, "last release over 3 years ago"),
        ]:
            if age < bound:
                recency_points = pts
                if msg:
                    recency_problems.append(msg)
                break
        else:
            recency_points = 0
            recency_problems.append("last release over 5 years ago")

    # ---- docs (health_score.py:180-252)
    docs_points, docs_problems, docs_bonuses = 0, [], []
    has_docs_url = _meaningful(d["docs_url"])
    if has_docs_url:
        docs_points += 4
        docs_bonuses.append("has dedicated docs URL:4")
    if d["description"] and len(d["description"]) > 150:
        docs_points += 18
    else:
        docs_problems.append("description too short (<150 chars)")
    has_purl = any(
        any(kw in k.lower() for kw in ["documentation", "docs", "homepage", "home"])
        and _meaningful(v)
        for k, v in zip(d["purl_keys"] or [], d["purl_vals"] or [])
    )
    if has_purl:
        docs_points += 3
        docs_bonuses.append("has documentation project URL:3")
    words = _wc(d["first_chapter"]) + _wc(d["main_content"])
    if words < 500 and not has_docs_url and not has_purl:
        docs_problems.append(_NOT_ENOUGH)
    if _has_screenshots(d["description"]):
        docs_points += 5
        docs_bonuses.append("has meaningful screenshots:5")

    # ---- metadata (health_score.py:265-311)
    metadata_points, metadata_problems, metadata_bonuses = 0, [], []
    if d["maintainer"] or d["author"]:
        metadata_points += 10
    else:
        metadata_problems += ["no maintainer info", "no author info"]
    if d["license"]:
        metadata_points += 10
    else:
        metadata_problems.append("no license")
    if (d["registry"] or "pypi") == "npm":
        if len(d["keywords"] or []) >= 3:
            metadata_points += 10
        else:
            metadata_problems.append("fewer than 3 keywords")
    else:
        if len(d["classifiers"] or []) >= 3:
            metadata_points += 10
        else:
            metadata_problems.append("fewer than 3 classifiers")

    # ---- GitHub bonuses (health_calculator.py:142-224)
    stars = d["github_stars"]
    stars_bonus = 0
    if stars:
        for bound, pts in [(1000, 10), (500, 7), (100, 5), (50, 3), (10, 1)]:
            if stars >= bound:
                stars_bonus = pts
                break
    activity_bonus = 0
    if d["github_updated"]:
        age_f = (NOW_TS - d["github_updated"]) / 86400
        for bound, pts in [(30, 10), (90, 7), (180, 5), (365, 3)]:
            if age_f < bound:
                activity_bonus = pts
                break
        if activity_bonus == 0:
            recency_problems.append("no GitHub activity in 1+ year")
        elif activity_bonus <= 3:
            recency_problems.append("limited GitHub activity (6+ months)")
    issue_bonus = 0
    if (
        d["github_open_issues"] is not None
        and stars is not None
        and stars > 0
    ):
        ratio = d["github_open_issues"] / stars
        for bound, pts in [(0.1, 10), (0.3, 7), (0.5, 5), (1.0, 3)]:
            if ratio < bound:
                issue_bonus = pts
                break
        if issue_bonus >= 5:
            metadata_bonuses.append("good issue management")

    gh = stars_bonus + activity_bonus + issue_bonus
    return {
        "name": d["name"],
        "health_score": min(100, recency_points + docs_points + metadata_points + gh),
        "recency_points": recency_points,
        "docs_points": docs_points,
        "metadata_points": metadata_points,
        "recency_problems": "|".join(recency_problems),
        "docs_problems": "|".join(docs_problems),
        "metadata_problems": "|".join(metadata_problems),
        "docs_bonuses": "|".join(docs_bonuses),
        "metadata_bonuses": "|".join(metadata_bonuses),
        "stars_bonus": stars_bonus,
        "activity_bonus": activity_bonus,
        "issue_bonus": issue_bonus,
        "github_bonus_total": gh,
    }


@pytest.fixture(scope="module")
def spark_rows(spark):
    from pyf_aggregator_spark.functions.health import health_scores

    out = health_scores(health_docs_df(spark), NOW_TS).collect()
    return {r["name"]: r.asDict() for r in out}


def test_spark_matches_reference_replay(spark_rows):
    for row in ROWS:
        expect = _reference_replay(row)
        got = spark_rows[expect["name"]]
        assert got == expect, f"{expect['name']}: {got} != {expect}"


def test_duckdb_oracle_matches_reference_replay():
    from pyf_aggregator_spark.registry import REGISTRY

    _, sql = REGISTRY["c12_health_score"]
    cols = list(_reference_replay(ROWS[0]))
    for rec in duckdb.sql(sql).df().to_dict("records"):
        expect = _reference_replay(
            next(r for r in ROWS if r[0] == rec["name"])
        )
        got = {c: rec[c] for c in cols}
        assert got == expect, f"{rec['name']}: {got} != {expect}"


# ------------------------------------------------- hand-derived pins
# Each pins a reference-published boundary through the full pipeline.


def test_exact_180_day_release_scores_30(spark_rows):
    # health_score.py:115-119: age_days < 180 is strict
    r = spark_rows["h07-boundaries"]
    assert r["recency_points"] == 30
    assert "last release over 6 months ago" in r["recency_problems"]


def test_width_199_rejected_200_counted(spark_rows):
    # screenshot_detector.py:42,210: >= 200 strict boundary; h07 has
    # one 199px img and one 200px img — the 200 one qualifies.
    assert "has meaningful screenshots:5" in spark_rows["h07-boundaries"][
        "docs_bonuses"
    ]


def test_len_150_description_too_short(spark_rows):
    # health_score.py:209: len > 150 strict; h04's is exactly 150.
    r = spark_rows["h04-legacy-iso"]
    assert "description too short (<150 chars)" in r["docs_problems"]
    # ...but its style-width screenshot still counts.
    assert "has meaningful screenshots:5" in r["docs_bonuses"]


def test_499_words_with_doc_link_no_problem(spark_rows):
    # health_score.py:239: 499 words but has_purl → no docs problem.
    assert _NOT_ENOUGH not in spark_rows["h07-boundaries"]["docs_problems"]


def test_499_plus_1_words_suppresses_problem(spark_rows):
    # h03: 499 + 1 = 500 words, no docs_url (pypi.org/project rejected),
    # no doc project urls → exactly 500 suppresses the problem.
    assert _NOT_ENOUGH not in spark_rows["h03-zerots"]["docs_problems"]


def test_npm_branch_uses_keywords(spark_rows):
    # health_score.py:296-303: npm packages judge keywords, not
    # classifiers. h02 has 4 classifiers but only 2 keywords.
    r = spark_rows["h02-mid"]
    assert "fewer than 3 keywords" in r["metadata_problems"]
    # h07 npm: 0 classifiers but 3 keywords → full metadata.
    assert spark_rows["h07-boundaries"]["metadata_points"] == 30


def test_cap_at_100(spark_rows):
    # health_calculator.py:217: base 86 + gh 17 capped.
    r = spark_rows["h08-cap"]
    assert r["health_score"] == 100
    assert (
        r["recency_points"] + r["docs_points"] + r["metadata_points"]
        + r["github_bonus_total"]
    ) > 100


def test_naive_iso_is_no_timestamp(spark_rows):
    # health_score.py:112-113: aware now − naive dt raises TypeError →
    # caught as "no release timestamp".
    r = spark_rows["h05-naive-iso"]
    assert r["recency_points"] == 0
    assert "no release timestamp" in r["recency_problems"]


def test_zero_unix_ts_is_no_timestamp(spark_rows):
    # health_score.py:100-103: int 0 ⇒ missing.
    assert spark_rows["h03-zerots"]["recency_points"] == 0


def test_data_attrs_not_confused_with_real_attrs(spark_rows):
    # h12: data-width="150" is NOT the width attribute (lxml .get()
    # semantics) — the style width 250 decides, so the screenshot
    # counts; an unanchored regex would read 150 and reject. The
    # second img has only data-src → no src → skipped entirely.
    assert "has meaningful screenshots:5" in spark_rows["h12-data-attrs"][
        "docs_bonuses"
    ]


def test_badge_with_width_not_screenshot(spark_rows):
    # h10: codecov badge with width=600 — badge filter wins; the empty
    # src img is skipped; no screenshot bonus.
    assert "screenshots" not in spark_rows["h10-ratio-edge"]["docs_bonuses"]


def test_issue_ratio_exactly_point1_scores_7(spark_rows):
    # health_calculator.py:310-312: ratio < 0.1 strict; h07 is 1/10.
    r = spark_rows["h07-boundaries"]
    assert r["issue_bonus"] == 7
    assert r["metadata_bonuses"] == "good issue management"


def test_open_issues_key_absent_skips_issue_bonus(spark_rows):
    # health_calculator.py:170: both keys must be present; h02 has
    # stars but NULL (absent) open_issues.
    assert spark_rows["h02-mid"]["issue_bonus"] == 0


def test_activity_problems_thread_into_recency(spark_rows):
    # health_calculator.py:160-165
    assert (
        "no GitHub activity in 1+ year"
        in spark_rows["h05-naive-iso"]["recency_problems"]
    )
    assert (
        "limited GitHub activity (6+ months)"
        in spark_rows["h02-mid"]["recency_problems"]
    )
