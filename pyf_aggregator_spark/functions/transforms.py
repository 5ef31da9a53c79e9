"""Scalar transform library (SURVEY.md §2.7) as JVM column expressions.

Each function re-implements one of the reference's per-document plugin
transforms as pure column algebra — whole-stage-codegen'd, no Python in
the hot path. Reference citations give the behavior source; the code is
written Spark-first, not translated.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------- C1 keyword split
# reference: indexer.py:12-21 — re.split(r"[,\s]+"), strip, drop empties


def keyword_split(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(F.split(c, r"[,\s]+"), lambda k: F.trim(k)),
        lambda k: k != F.lit(""),
    )


# ----------------------------------------------- C2/C3 version parse+encode
# reference: version_slicer.py:5-43 (regex parse), :51-102 (sortable encode)
# Format: STABLE.MAJOR.MINOR.BUGFIX.PRERELEASE_TYPE.PRERELEASE_NUM with
# 4-digit zero-pad; dev(0000) < alpha(0001) < beta(0002) < rc(0003);
# stable releases always outrank pre-releases (README.md:989-1008).

VERSION_RE = r"^(\d*)\.(\d*)\.?([a-zA-Z]+\d*)?(\d)?([a-zA-Z]+\d*)?$"
NO_MATCH_SORTABLE = "0.0000.0000.0000.0000.0000"


def _vgroup(v: Column, i: int) -> Column:
    return F.regexp_extract(v, VERSION_RE, i)


def version_parse(col: Column | str) -> Column:
    """→ struct(version_major int, version_minor int, version_bugfix int,
    postfix string, version_postfix string, matched boolean).

    No regex match ⇒ all zeros / empty (the reference keeps defaults when
    its regex rejects e.g. '1.2.3.4' — bugfix is a SINGLE digit there)."""
    v = F.col(col) if isinstance(col, str) else col
    matched = v.rlike(VERSION_RE)

    def num(i: int) -> Column:
        g = _vgroup(v, i)
        return F.when(matched & (g != ""), g.cast("int")).otherwise(0)

    def txt(i: int) -> Column:
        return F.when(matched, _vgroup(v, i)).otherwise("")

    return F.struct(
        num(1).alias("version_major"),
        num(2).alias("version_minor"),
        num(4).alias("version_bugfix"),
        txt(3).alias("postfix"),
        txt(5).alias("version_postfix"),
        matched.alias("matched"),
    )


def version_sortable(col: Column | str) -> Column:
    """Zero-padded sortable encoding; lexicographic desc == PyPI 'latest'."""
    v = F.col(col) if isinstance(col, str) else col
    matched = v.rlike(VERSION_RE)

    def seg(i: int) -> Column:
        g = _vgroup(v, i)
        return F.lpad(F.when(g == "", "0").otherwise(g), 4, "0")

    postfix = F.when(_vgroup(v, 3) != "", _vgroup(v, 3)).otherwise(_vgroup(v, 5))
    pl = F.lower(postfix)
    is_a = pl.startswith("a")
    is_b = pl.startswith("b")
    is_rc = pl.startswith("rc") | pl.startswith("c")
    is_dev = pl.startswith("dev")
    is_pre = (pl != "") & (is_a | is_b | is_rc | is_dev)

    stable_flag = F.when(is_pre, "0").otherwise("1")
    pre_type = (
        F.when(~is_pre, "0000")
        .when(is_a, "0001")
        .when(is_b, "0002")
        .when(is_rc, "0003")
        .otherwise("0000")  # dev sorts before alpha
    )
    digits = F.regexp_replace(postfix, "[^0-9]", "")
    pre_num = F.when(
        is_pre, F.lpad(F.when(digits == "", "0").otherwise(digits), 4, "0")
    ).otherwise("0000")

    encoded = F.concat_ws(
        ".", stable_flag, seg(1), seg(2), seg(4), pre_type, pre_num
    )
    return F.when(matched, encoded).otherwise(F.lit(NO_MATCH_SORTABLE))


# ------------------------------------- C4 classifier → version extraction
# reference: framwork_versions.py:4-18, python_versions.py:4-18


def classifier_versions(col: Column | str, prefix: str) -> Column:
    """Extract trailing version numbers from classifiers with a prefix,
    e.g. 'Framework :: Plone :: 6.0' → '6.0'."""
    c = F.col(col) if isinstance(col, str) else col
    pat = "^" + prefix.replace("::", "\\s*::\\s*") + "\\s*::\\s*([0-9][0-9.]*)$"
    return F.filter(
        F.transform(c, lambda x: F.regexp_extract(x, pat, 1)),
        lambda x: x != F.lit(""),
    )


# ---------------------------------------------- C8 GitHub URL → owner/repo
# reference: github.py:53-113 (5 URL grammars), :457-498 + clean/validate
# (#fragment/?query strip, reserved owners, [A-Za-z0-9._-] charset).

_NAME = r"[A-Za-z0-9._-]+"
_GH_PATTERNS = [
    rf"^(?:https?://|www\.)github\.com/({_NAME}/{_NAME})",
    rf"^git://github\.com/({_NAME}/{_NAME})$",
    rf"^git\+https://github\.com/({_NAME}/{_NAME})$",
    rf"^git\+ssh://git@github\.com[:/]({_NAME}/{_NAME})$",
    rf"^git@github\.com[:/]({_NAME}/{_NAME})$",
]
GITHUB_RESERVED_OWNERS = [
    "about", "apps", "collections", "marketplace",
    "orgs", "settings", "sponsors", "topics",
]


def github_owner_repo(col: Column | str) -> Column:
    """→ 'owner/repo' or NULL. Strips #fragment/?query and .git, rejects
    reserved owners."""
    u = F.col(col) if isinstance(col, str) else col
    base = F.regexp_replace(F.regexp_replace(u, r"[#?].*$", ""), r"\.git$", "")
    cand = F.coalesce(
        *[F.nullif(F.regexp_extract(base, p, 1), F.lit("")) for p in _GH_PATTERNS]
    )
    owner = F.lower(F.split_part(cand, F.lit("/"), F.lit(1)))
    return F.when(owner.isin(GITHUB_RESERVED_OWNERS), F.lit(None)).otherwise(cand)


def github_https_url(col: Column | str) -> Column:
    """C9: any git URL grammar → canonical https URL
    (npm_fetcher.py:580-616)."""
    repo = github_owner_repo(col)
    return F.when(
        repo.isNotNull(), F.concat(F.lit("https://github.com/"), repo)
    ).otherwise(F.lit(None))


# --------------------------------------------------- C10 ISO8601 → int64
# reference: fetcher.py:139-146 — Unix seconds, 0 on missing/failure


def iso_to_unix(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.unix_timestamp(F.try_to_timestamp(c)), F.lit(0)
    ).cast("long")


# ------------------------------------------------ C11 null normalization
# reference: indexer.py:26-37 — None → ""/[]/0 by field class; registry
# defaults to 'pypi' (clean_data).


def clean_string(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(""))


def clean_registry(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit("pypi"))


