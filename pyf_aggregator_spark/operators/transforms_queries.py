"""Registry queries for the scalar-transform operators (SURVEY §2.7)
plus the fixture-based filter/join/window operators (F1, F4, J1, W2).

Spark side uses functions/transforms.py column expressions; the oracle
SQL re-states the same semantics in DuckDB over the identical VALUES
fixture (fixtures/packages.py renders both sides from ONE literal)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyf_aggregator_spark.fixtures.health import (
    NOW_TS,
    health_docs_df,
    health_values_sql,
)
from pyf_aggregator_spark.fixtures.packages import (
    enrichment_df,
    enrichment_values_sql,
    packages_df,
    packages_values_sql,
)
from pyf_aggregator_spark.functions.health import health_scores
from pyf_aggregator_spark.functions.transforms import (
    GITHUB_RESERVED_OWNERS,
    VERSION_RE,
    classifier_versions,
    clean_registry,
    clean_string,
    github_https_url,
    github_owner_repo,
    iso_to_unix,
    keyword_split,
    version_parse,
    version_sortable,
)
from pyf_aggregator_spark.registry import register

PKG = packages_values_sql()
ENR = enrichment_values_sql()

# ---------------------------------------------------------------------- C1


@register(
    "c1_c4_array_transforms",
    f"""
    WITH {PKG}
    SELECT name, version, unnest(
      list_filter(list_transform(string_split_regex(keywords, '[,\\s]+'),
                                 k -> trim(k)), k -> k <> '')
    ) AS keyword,
    coalesce(array_to_string(
      list_filter(
        list_transform(classifiers,
          c -> regexp_extract(c, '^Framework\\s*::\\s*Plone\\s*::\\s*([0-9][0-9.]*)$', 1)),
        x -> x <> ''), ','), '') AS plone_versions
    FROM packages
    ORDER BY name, version, keyword
    """,
)
def c1_c4_array_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 (keyword split: re.split('[,\\s]+') + trim + drop empties,
    indexer.py:12-21) exploded to rows, plus C4 (classifier →
    framework-version extraction, framwork_versions.py:4-18) as a
    joined column — both pure array algebra, zero UDFs."""
    return (
        packages_df(spark)
        .select(
            "name", "version",
            F.explode(keyword_split("keywords")).alias("keyword"),
            F.array_join(
                classifier_versions("classifiers", "Framework :: Plone"), ","
            ).alias("plone_versions"),
        )
        .orderBy("name", "version", "keyword")
    )


# ------------------------------------------------------------------- C2/C3

_V_SQL_CASE = f"""
  CASE WHEN NOT regexp_matches(version, '{VERSION_RE}')
       THEN '0.0000.0000.0000.0000.0000'
       ELSE concat_ws('.',
         CASE WHEN pfx = '' THEN '1'
              WHEN starts_with(lower(pfx), 'a') OR starts_with(lower(pfx), 'b')
                OR starts_with(lower(pfx), 'rc') OR starts_with(lower(pfx), 'c')
                OR starts_with(lower(pfx), 'dev') THEN '0'
              ELSE '1' END,
         lpad(CASE WHEN g1 = '' THEN '0' ELSE g1 END, 4, '0'),
         lpad(CASE WHEN g2 = '' THEN '0' ELSE g2 END, 4, '0'),
         lpad(CASE WHEN g4 = '' THEN '0' ELSE g4 END, 4, '0'),
         CASE WHEN pfx = '' THEN '0000'
              WHEN starts_with(lower(pfx), 'a') THEN '0001'
              WHEN starts_with(lower(pfx), 'b') THEN '0002'
              WHEN starts_with(lower(pfx), 'rc') OR starts_with(lower(pfx), 'c') THEN '0003'
              WHEN starts_with(lower(pfx), 'dev') THEN '0000'
              ELSE '0000' END,
         CASE WHEN pfx = '' OR NOT (
                starts_with(lower(pfx), 'a') OR starts_with(lower(pfx), 'b')
                OR starts_with(lower(pfx), 'rc') OR starts_with(lower(pfx), 'c')
                OR starts_with(lower(pfx), 'dev'))
              THEN '0000'
              ELSE lpad(CASE WHEN regexp_replace(pfx, '[^0-9]', '', 'g') = ''
                             THEN '0'
                             ELSE regexp_replace(pfx, '[^0-9]', '', 'g') END, 4, '0')
              END)
  END
"""

_V_GROUPS = f"""
  SELECT name, version,
         regexp_extract(version, '{VERSION_RE}', 1) AS g1,
         regexp_extract(version, '{VERSION_RE}', 2) AS g2,
         regexp_extract(version, '{VERSION_RE}', 3) AS g3,
         regexp_extract(version, '{VERSION_RE}', 4) AS g4,
         regexp_extract(version, '{VERSION_RE}', 5) AS g5,
         CASE WHEN regexp_extract(version, '{VERSION_RE}', 3) <> ''
              THEN regexp_extract(version, '{VERSION_RE}', 3)
              ELSE regexp_extract(version, '{VERSION_RE}', 5) END AS pfx
  FROM packages
"""


@register(
    "c2_c3_version_parse_sortable",
    f"""
    WITH {PKG}, g AS ({_V_GROUPS})
    SELECT name, version,
      CASE WHEN regexp_matches(version, '{VERSION_RE}') AND g1 <> ''
           THEN g1::INT ELSE 0 END AS version_major,
      CASE WHEN regexp_matches(version, '{VERSION_RE}') AND g2 <> ''
           THEN g2::INT ELSE 0 END AS version_minor,
      CASE WHEN regexp_matches(version, '{VERSION_RE}') AND g4 <> ''
           THEN g4::INT ELSE 0 END AS version_bugfix,
      CASE WHEN regexp_matches(version, '{VERSION_RE}') THEN g3 ELSE '' END AS postfix,
      CASE WHEN regexp_matches(version, '{VERSION_RE}') THEN g5 ELSE '' END AS version_postfix,
      {_V_SQL_CASE} AS version_sortable
    FROM g
    ORDER BY name, version
    """,
)
def c2_c3_version_parse_sortable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 (version regex parse, version_slicer.py:5-43) + C3 (sortable
    6-segment zero-padded encoding, version_slicer.py:51-102) in one
    projection — pure regexp_extract / when-chain column algebra."""
    return (
        packages_df(spark)
        .select("name", "version", version_parse("version").alias("v"))
        .select(
            "name", "version",
            "v.version_major", "v.version_minor", "v.version_bugfix",
            "v.postfix", "v.version_postfix",
            version_sortable("version").alias("version_sortable"),
        )
        .orderBy("name", "version")
    )


@register(
    "w2_f4_latest_version_nonexcluded",
    f"""
    WITH {PKG}, g AS ({_V_GROUPS}),
    enc AS (
      SELECT name, version, {_V_SQL_CASE} AS vs
      FROM g JOIN packages p USING (name, version)
      WHERE p.registry IS DISTINCT FROM 'npm'
    )
    SELECT name, version FROM (
      SELECT name, version,
             row_number() OVER (PARTITION BY name ORDER BY vs DESC, version DESC) AS rn
      FROM enc
    ) WHERE rn = 1
    ORDER BY name
    """,
)
def w2_f4_latest_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 (lexicographic sort on version_sortable == PyPI 'latest':
    stable 2.5.3 beats pre-release 3.0.0a2; README.md:994-1006)
    composed with F4 (exclude-registry with legacy-null tolerance,
    db.py:307-347: docs WITHOUT `registry` are NOT excluded — the
    3-valued-logic trap a bare `!=` gets wrong)."""
    w = Window.partitionBy("name").orderBy(
        F.desc("vs"), F.desc("version")
    )
    return (
        packages_df(spark)
        .filter((F.col("registry") != "npm") | F.col("registry").isNull())
        .withColumn("vs", version_sortable("version"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("name", "version")
        .orderBy("name")
    )


# ---------------------------------------------------------------------- C4


# ------------------------------------------------------------------- C8/C9

_GH_NAME = "[A-Za-z0-9._-]+"
_GH_SQL_PATTERNS = [
    f"^(?:https?://|www\\.)github\\.com/({_GH_NAME}/{_GH_NAME})",
    f"^git://github\\.com/({_GH_NAME}/{_GH_NAME})$",
    f"^git\\+https://github\\.com/({_GH_NAME}/{_GH_NAME})$",
    f"^git\\+ssh://git@github\\.com[:/]({_GH_NAME}/{_GH_NAME})$",
    f"^git@github\\.com[:/]({_GH_NAME}/{_GH_NAME})$",
]
_RESERVED_IN = ", ".join(f"'{o}'" for o in GITHUB_RESERVED_OWNERS)

_GH_CAND = "coalesce(" + ", ".join(
    f"nullif(regexp_extract(base, '{p}', 1), '')" for p in _GH_SQL_PATTERNS
) + ")"

_GH_CTE = f"""
gh AS (
  SELECT name, version, home_page,
         CASE WHEN lower(split_part({_GH_CAND}, '/', 1)) IN ({_RESERVED_IN})
              THEN NULL ELSE {_GH_CAND} END AS owner_repo
  FROM (
    SELECT name, version, home_page,
           regexp_replace(regexp_replace(home_page, '[#?].*$', ''), '\\.git$', '') AS base
    FROM packages
  )
)"""


@register(
    "c8_c11_normalizers",
    f"""
    WITH {PKG}, {_GH_CTE}
    SELECT name, version, owner_repo,
           CASE WHEN owner_repo IS NULL THEN NULL
                ELSE 'https://github.com/' || owner_repo END AS https_url,
           coalesce(summary, '') AS summary_clean,
           coalesce(keywords, '') AS keywords_clean,
           coalesce(registry, 'pypi') AS registry_clean,
           coalesce(epoch(TRY_CAST(upload_iso AS TIMESTAMPTZ))::BIGINT, 0) AS upload_unix
    FROM gh JOIN packages USING (name, version)
    ORDER BY name, version
    """,
)
def c8_c11_normalizers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 (GitHub URL → owner/repo across 5 grammars with reserved-
    owner validation and #fragment/?query strip, github.py:53-113) +
    C9 (git URL → https normalization, npm_fetcher.py:580-616) + C10
    (ISO8601 → unix, fetcher.py:410-429) + C11 (null normalization,
    fetcher.py:389-408) in ONE per-package row — all four are
    per-document column algebra over the same packages frame, so one
    labeled row keeps each graded while freeing a registry-window slot
    (merged r4, same precedent as j3/j4)."""
    return (
        packages_df(spark)
        .select(
            "name", "version",
            github_owner_repo("home_page").alias("owner_repo"),
            github_https_url("home_page").alias("https_url"),
            clean_string("summary").alias("summary_clean"),
            clean_string("keywords").alias("keywords_clean"),
            clean_registry("registry").alias("registry_clean"),
            iso_to_unix("upload_iso").alias("upload_unix"),
        )
        .orderBy("name", "version")
    )


# ---------------------------------------------------------------- F1 / F4


@register(
    "f1_classifier_prefix_filter",
    f"""
    WITH {PKG},
    curated(name, curated_score, curated_domain) AS (
      SELECT * FROM (VALUES
        ('plone.api', 1, 'plone'), ('betapkg', 7, 'plone'))
    )
    SELECT p.name, p.version, c.curated_score, c.curated_domain
    FROM packages p LEFT JOIN curated c USING (name)
    WHERE len(list_filter(classifiers, x -> x LIKE 'Framework :: Plone%')) > 0
    ORDER BY p.name, p.version
    """,
)
def f1_classifier_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: keep doc if ANY classifier startswith the filter prefix
    (fetcher.py:582-602) — higher-order exists, no explode needed.
    Plus the curated-list plugin (plugins/curated.py:13-17): a static
    name→(score, domain) map attached per doc, fields absent (null)
    for names outside the map. Spark shape: broadcast left join — the
    curated list is a YAML file, always driver-small."""
    curated = spark.createDataFrame(
        [("plone.api", 1, "plone"), ("betapkg", 7, "plone")],
        "name string, curated_score int, curated_domain string",
    )
    return (
        packages_df(spark)
        .filter(F.exists("classifiers", lambda c: c.startswith("Framework :: Plone")))
        .join(F.broadcast(curated), "name", "left")
        .select("name", "version", "curated_score", "curated_domain")
        .orderBy("name", "version")
    )


# ---------------------------------------------------------------------- J1


@register(
    "j1_preserved_fields_merge",
    f"""
    WITH {PKG}, {ENR},
    newest AS (
      SELECT name, github_stars, github_open_issues FROM (
        SELECT *, row_number() OVER (
          PARTITION BY name ORDER BY enriched_iso DESC
        ) AS rn FROM enrichment
      ) WHERE rn = 1
    )
    SELECT p.name, p.version, n.github_stars, n.github_open_issues
    FROM packages p LEFT JOIN newest n USING (name)
    ORDER BY p.name, p.version
    """,
)
def j1_preserved_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: refresh merge (main.py:115-160; queue.py:896-910): newest
    existing doc's GitHub fields left-joined onto ALL fresh version
    docs; broadcast join (enrichment is small by construction)."""
    w = Window.partitionBy("name").orderBy(F.desc("enriched_iso"))
    newest = (
        enrichment_df(spark)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("name", "github_stars", "github_open_issues")
    )
    return (
        packages_df(spark)
        .join(F.broadcast(newest), "name", "left")
        .select("name", "version", "github_stars", "github_open_issues")
        .orderBy("name", "version")
    )


# --------------------------------------------------------------------- C12
# Exact-formula health score (round-5 upgrade from the bucketed analog):
# plugins/health_score.py (recency/docs/metadata + problems/bonuses),
# enrichers/health_calculator.py:104-223 (GitHub bonuses, min(100, ·)),
# plugins/screenshot_detector.py (badge filter, min width 200).
# Spark side: functions/health.py column algebra over the health_docs
# fixture; oracle: an independent DuckDB replay below (same NOW pin).


def _sql_meaningful(u: str) -> str:
    """DuckDB snippet for health_score.py:147-177 (is_meaningful_docs_url)."""
    return (
        f"({u} IS NOT NULL AND {u} <> '' "
        f"AND NOT contains(lower({u}), 'pypi.org/project/') "
        f"AND NOT regexp_matches(lower({u}), "
        r"'^https?://(www\.)?(github|gitlab)\.(com|io)/[^/]+/[^/]+(/?|#.*)$'"
        "))"
    )


def _sql_wc(c: str) -> str:
    """DuckDB snippet for health_score.py:8-12 (count_words)."""
    return (
        f"(CASE WHEN {c} IS NULL OR trim({c}) = '' THEN 0 "
        rf"ELSE len(regexp_split_to_array(trim({c}), '\s+')) END)"
    )


_SQL_BADGE = (
    r"'(?i)shields\.io|img\.shields\.io|badge\.fury\.io|"
    r"travis-ci\.(org|com)|codecov\.io|coveralls\.io|circleci\.com|"
    r"github\.com/[^/]+/[^/]+/workflows/[^/]+\.svg|"
    r"github\.com/[^/]+/[^/]+/actions/workflows/[^/]+/badge|"
    r"readthedocs\.org/[^/]+/badge|pypi\.org/badges|"
    r"pypi\.python\.org/[^/]*badge|ci\.appveyor\.com|snyk\.io|"
    r"codacy\.com|sonarcloud\.io|badge'"
)

# Per-<img> width: attr first (strip trailing px, TRY_CAST), then CSS
# style — screenshot_detector.py:126-159; -1 sentinel = undeterminable.
# Attr names anchor on a non-name char so data-width/data-src never
# match (lxml .get() semantics); the CSS width regex stays unanchored
# like the reference's own parse_width_from_style.
_SQL_IMG_W = (
    "coalesce("
    "TRY_CAST(trim(regexp_replace("
    "regexp_extract(t, '(?:^|[^\\w-])width=\"([^\"]*)\"', 1), "
    "'[px]+$', '')) AS INT), "
    "TRY_CAST(regexp_extract("
    "regexp_extract(t, '(?:^|[^\\w-])style=\"([^\"]*)\"', 1), "
    r"'(?i)width\s*:\s*(\d+)(?:px)?'"
    ", 1) AS INT), -1)"
)

_SQL_SCREENS = (
    "(description IS NOT NULL AND len(list_filter("
    "regexp_extract_all(description, '<img[^>]*>'), "
    "t -> regexp_extract(t, '(?:^|[^\\w-])src=\"([^\"]*)\"', 1) <> '' "
    "AND NOT regexp_matches("
    "regexp_extract(t, '(?:^|[^\\w-])src=\"([^\"]*)\"', 1), "
    f"{_SQL_BADGE}) "
    f"AND {_SQL_IMG_W} >= 200)) > 0)"
)

_HLT = health_values_sql()
_NOW = NOW_TS

_NOT_ENOUGH = (
    "not enough documentation (extend README to 500+ words or add"
    " documentation link)"
)


@register(
    "c12_health_score",
    f"""
    WITH {_HLT},
    s1 AS (
      SELECT name,
        CASE WHEN upload_ts IS NOT NULL AND upload_ts <> 0 THEN upload_ts
             WHEN upload_iso IS NOT NULL
                  AND regexp_matches(upload_iso, '(Z|[+-]\\d{{2}}:\\d{{2}})$')
             THEN CAST(epoch(TRY_CAST(upload_iso AS TIMESTAMPTZ)) AS BIGINT)
        END AS up_sec,
        {_sql_meaningful('docs_url')} AS has_docs_url,
        (description IS NOT NULL AND length(description) > 150) AS desc_ok,
        len(list_filter(
          list_zip(coalesce(purl_keys, []), coalesce(purl_vals, [])),
          p -> regexp_matches(lower(p[1]), '(documentation|docs|home)')
               AND {_sql_meaningful('p[2]')}
        )) > 0 AS has_purl,
        {_sql_wc('first_chapter')} + {_sql_wc('main_content')} AS readme_words,
        {_SQL_SCREENS} AS screens,
        ((maintainer IS NOT NULL AND maintainer <> '')
         OR (author IS NOT NULL AND author <> '')) AS has_person,
        (license IS NOT NULL AND license <> '') AS has_license,
        coalesce(registry, 'pypi') = 'npm' AS is_npm,
        CASE WHEN coalesce(registry, 'pypi') = 'npm'
             THEN len(coalesce(keywords, [])) >= 3
             ELSE len(coalesce(classifiers, [])) >= 3 END AS class_ok,
        github_stars, github_updated, github_open_issues
      FROM health_docs
    ),
    s2 AS (
      SELECT *,
        CAST(floor(({_NOW} - up_sec) / 86400.0) AS BIGINT) AS age_days,
        CASE WHEN github_stars IS NOT NULL AND github_stars <> 0 THEN
          CASE WHEN github_stars >= 1000 THEN 10 WHEN github_stars >= 500 THEN 7
               WHEN github_stars >= 100 THEN 5 WHEN github_stars >= 50 THEN 3
               WHEN github_stars >= 10 THEN 1 ELSE 0 END
        ELSE 0 END AS stars_bonus,
        CASE WHEN github_updated IS NOT NULL AND github_updated <> 0 THEN
          CASE WHEN ({_NOW} - github_updated) / 86400.0 < 30 THEN 10
               WHEN ({_NOW} - github_updated) / 86400.0 < 90 THEN 7
               WHEN ({_NOW} - github_updated) / 86400.0 < 180 THEN 5
               WHEN ({_NOW} - github_updated) / 86400.0 < 365 THEN 3
               ELSE 0 END
        ELSE 0 END AS activity_bonus,
        CASE WHEN github_open_issues IS NOT NULL AND github_stars IS NOT NULL
                  AND github_stars > 0 THEN
          CASE WHEN github_open_issues * 1.0 / github_stars < 0.1 THEN 10
               WHEN github_open_issues * 1.0 / github_stars < 0.3 THEN 7
               WHEN github_open_issues * 1.0 / github_stars < 0.5 THEN 5
               WHEN github_open_issues * 1.0 / github_stars < 1.0 THEN 3
               ELSE 0 END
        ELSE 0 END AS issue_bonus
      FROM s1
    ),
    s3 AS (
      SELECT *,
        CASE WHEN up_sec IS NULL THEN 0 WHEN age_days < 180 THEN 40
             WHEN age_days < 365 THEN 30 WHEN age_days < 730 THEN 20
             WHEN age_days < 1095 THEN 10 WHEN age_days < 1825 THEN 5
             ELSE 0 END AS recency_points,
        (CASE WHEN has_docs_url THEN 4 ELSE 0 END
         + CASE WHEN desc_ok THEN 18 ELSE 0 END
         + CASE WHEN has_purl THEN 3 ELSE 0 END
         + CASE WHEN screens THEN 5 ELSE 0 END) AS docs_points,
        (CASE WHEN has_person THEN 10 ELSE 0 END
         + CASE WHEN has_license THEN 10 ELSE 0 END
         + CASE WHEN class_ok THEN 10 ELSE 0 END) AS metadata_points,
        stars_bonus + activity_bonus + issue_bonus AS github_bonus_total
      FROM s2
    )
    SELECT name,
      least(100, recency_points + docs_points + metadata_points
                 + github_bonus_total)::INT AS health_score,
      recency_points::INT AS recency_points,
      docs_points::INT AS docs_points,
      metadata_points::INT AS metadata_points,
      concat_ws('|',
        CASE WHEN up_sec IS NULL THEN 'no release timestamp'
             WHEN age_days < 180 THEN NULL
             WHEN age_days < 365 THEN 'last release over 6 months ago'
             WHEN age_days < 730 THEN 'last release over 1 year ago'
             WHEN age_days < 1095 THEN 'last release over 2 years ago'
             WHEN age_days < 1825 THEN 'last release over 3 years ago'
             ELSE 'last release over 5 years ago' END,
        CASE WHEN github_updated IS NOT NULL AND github_updated <> 0
                  AND activity_bonus = 0
             THEN 'no GitHub activity in 1+ year'
             WHEN github_updated IS NOT NULL AND github_updated <> 0
                  AND activity_bonus <= 3
             THEN 'limited GitHub activity (6+ months)' END
      ) AS recency_problems,
      concat_ws('|',
        CASE WHEN NOT desc_ok THEN 'description too short (<150 chars)' END,
        CASE WHEN readme_words < 500 AND NOT has_docs_url AND NOT has_purl
             THEN '{_NOT_ENOUGH}' END
      ) AS docs_problems,
      concat_ws('|',
        CASE WHEN NOT has_person THEN 'no maintainer info' END,
        CASE WHEN NOT has_person THEN 'no author info' END,
        CASE WHEN NOT has_license THEN 'no license' END,
        CASE WHEN NOT class_ok THEN
          CASE WHEN is_npm THEN 'fewer than 3 keywords'
               ELSE 'fewer than 3 classifiers' END END
      ) AS metadata_problems,
      concat_ws('|',
        CASE WHEN has_docs_url THEN 'has dedicated docs URL:4' END,
        CASE WHEN has_purl THEN 'has documentation project URL:3' END,
        CASE WHEN screens THEN 'has meaningful screenshots:5' END
      ) AS docs_bonuses,
      concat_ws('|',
        CASE WHEN issue_bonus >= 5 THEN 'good issue management' END
      ) AS metadata_bonuses,
      stars_bonus::INT AS stars_bonus,
      activity_bonus::INT AS activity_bonus,
      issue_bonus::INT AS issue_bonus,
      github_bonus_total::INT AS github_bonus_total
    FROM s3 ORDER BY name
    """,
)
def c12_health_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12: the reference's EXACT health formula (health_score.py:15-311
    + health_calculator.py:104-223 + screenshot_detector.py), flattened
    breakdown included — see functions/health.py for the column algebra
    and the documented engine-level deltas."""
    return health_scores(health_docs_df(spark), NOW_TS)


# --------------------------------------------------------------- A5 (array)


@register(
    "a5_array_facet_counts",
    f"""
    WITH {PKG}
    SELECT classifier AS facet_value, count(*) AS n
    FROM packages, unnest(classifiers) AS u(classifier)
    GROUP BY 1
    ORDER BY n DESC, facet_value
    """,
)
def a5_array_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 array form: `classifiers`/`keywords` are string[] facets in
    the reference schema (db.py:96-152) — explode the array, count per
    value. The explode stays pipelined into the partial aggregation
    (one shuffle of (value, partial_count) rows, never of the exploded
    rows themselves)."""
    return (
        packages_df(spark)
        .select(F.explode("classifiers").alias("facet_value"))
        .groupBy("facet_value")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "facet_value")
    )
