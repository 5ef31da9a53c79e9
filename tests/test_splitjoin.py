"""split_join_tokens — Typesense's space-as-typo fallback (default-on
upstream, db.py:266-290 passes no override). Unit tests pin the
deterministic rewrite rule (search/splitjoin.py); facade tests drive
the retry end-to-end against the live engine and the equivalent
as-intended query; the graded branches live in ft_typesense_defaults
(oracle: oracle/sql.py::split_join_topk_sql, SQL-decided)."""

from __future__ import annotations

import pytest

from pyf_aggregator_spark.search.api import search
from pyf_aggregator_spark.search.splitjoin import best_split, rewrite_tokens


# ---------------- rewrite rule (pure, no Spark)

DF = {
    "basket": 50, "ball": 80, "basketball": 10,
    "customer": 90, "vector": 70,
    "cust": 5, "om": 3, "er": 40, "omer": 0,  # omer NOT in vocab
}
DF = {k: v for k, v in DF.items() if v > 0}


def test_join_wins_over_split():
    # "basketball" could split (basket|ball) but the pair to its left
    # joins first only when adjacent concat is vocab; standalone token
    # known → untouched
    assert rewrite_tokens(["basketball"], DF) is None  # known: no change
    # join consumes the pair and scanning resumes AFTER it
    assert rewrite_tokens(["basket", "ball"], DF) == ["basketball"]


def test_split_unknown_token_best_min_df():
    # customervector: only valid split is customer|vector
    df = dict(DF, customervector=0)
    df.pop("customervector")
    assert rewrite_tokens(["customervector"], DF) == ["customer", "vector"]
    # min-df maximization: custom|er (min 40) vs cust|omer (omer absent)
    df2 = {"custom": 2, "er": 40, "cust": 99, "omer": 0}
    df2.pop("omer")
    assert best_split("customer", df2) == ("custom", "er")


def test_split_tie_breaks_leftmost():
    df = {"ab": 10, "cd": 10, "abc": 10, "d": 10}
    # splits of "abcd": ab|cd (min 10, i=2) and abc|d (min 10, i=3)
    assert best_split("abcd", df) == ("ab", "cd")


def test_known_tokens_never_split():
    df = {"basketball": 1, "basket": 99, "ball": 99}
    assert rewrite_tokens(["basketball"], df) is None


def test_no_change_returns_none():
    assert rewrite_tokens(["zzz", "qqq"], {"spark": 1}) is None
    assert rewrite_tokens([], {"spark": 1}) is None


def test_join_then_continue():
    # [basket, ball, cust] → join pair, then cust (known) unchanged
    df = dict(DF)
    assert rewrite_tokens(["basket", "ball", "cust"], df) == [
        "basketball", "cust",
    ]


# ---------------- facade end-to-end (live engine, sf0.001)


def _ids(resp):
    return [h["document"]["doc_id"] for h in resp["hits"]]


def test_facade_join_fallback(spark, sf_dir):
    """'cust omer' (both absent from the corpus vocabulary) matches
    nothing as typed; fallback joins to 'customer' and retries —
    rank-identical to querying 'customer' directly."""
    joined = search(
        spark, sf_dir,
        {"q": "cust omer", "split_join_tokens": "fallback",
         "num_typos": 0, "per_page": 10},
    )
    direct = search(
        spark, sf_dir, {"q": "customer", "num_typos": 0, "per_page": 10}
    )
    assert _ids(joined) == _ids(direct)
    assert joined["found"] == direct["found"] > 0


def test_facade_split_fallback(spark, sf_dir):
    """'customervector' (absent) splits into 'customer vector' (the
    only two-vocabulary-word split) and retries or-mode."""
    split = search(
        spark, sf_dir,
        {"q": "customervector", "split_join_tokens": "fallback",
         "num_typos": 0, "per_page": 10},
    )
    direct = search(
        spark, sf_dir,
        {"q": "customer vector", "num_typos": 0, "per_page": 10},
    )
    assert _ids(split) == _ids(direct)
    assert split["found"] == direct["found"] > 0


def test_facade_fallback_noop_when_hits(spark, sf_dir):
    """fallback never rewrites a query that already matches — even when
    a join variant exists in the vocabulary."""
    plain = search(spark, sf_dir, {"q": "spark", "num_typos": 0})
    fb = search(
        spark, sf_dir,
        {"q": "spark", "split_join_tokens": "fallback", "num_typos": 0},
    )
    assert _ids(fb) == _ids(plain)
    assert fb["found"] == plain["found"]


def test_facade_off_default(spark, sf_dir):
    """split_join_tokens defaults off (facade divergence from the
    Typesense default, like prefix — documented): unknown tokens stay
    unmatched."""
    r = search(spark, sf_dir, {"q": "cust omer", "num_typos": 0})
    assert r["found"] == 0 and r["hits"] == []


def test_facade_underivable_rewrite_stays_empty(spark, sf_dir):
    """No vocabulary join/split derivable → the empty original result
    stands (one retry max, no loop)."""
    r = search(
        spark, sf_dir,
        {"q": "qqqzzzwww xxyyzz", "split_join_tokens": "fallback",
         "num_typos": 0},
    )
    assert r["found"] == 0 and r["hits"] == []


def test_facade_always_mode(spark, sf_dir):
    """always = rewrite up front, no zero-result gate: a derivable
    rewrite replaces the query even though the original would match."""
    # 'customer vector' matches as typed; with always, an adjacent-pair
    # join applies only if 'customervector' is vocabulary (it is not),
    # so the query is unchanged → same results
    a = search(
        spark, sf_dir,
        {"q": "customer vector", "split_join_tokens": "always",
         "num_typos": 0},
    )
    plain = search(
        spark, sf_dir, {"q": "customer vector", "num_typos": 0}
    )
    assert _ids(a) == _ids(plain)
    # and an unknown-token query rewrites without needing the zero gate
    b = search(
        spark, sf_dir,
        {"q": "customervector", "split_join_tokens": "always",
         "num_typos": 0},
    )
    direct = search(
        spark, sf_dir, {"q": "customer vector", "num_typos": 0}
    )
    assert _ids(b) == _ids(direct)


def test_facade_bad_mode_raises(spark, sf_dir):
    with pytest.raises(ValueError, match="split_join_tokens"):
        search(
            spark, sf_dir,
            {"q": "spark", "split_join_tokens": "sometimes"},
        )


def test_facade_quoted_phrase_disables_split_join(spark, sf_dir):
    """Quoted q = exact — no fallback rewriting inside quotes (the same
    rule that disables typo/prefix/drop for phrases)."""
    r = search(
        spark, sf_dir,
        {"q": '"cust omer"', "split_join_tokens": "fallback"},
    )
    assert r["found"] == 0


def test_facade_split_join_composes_with_filter(spark, sf_dir):
    """The retry re-enters the full pipeline: filter_by applies to the
    rewritten query exactly as it would to the as-intended one."""
    f = search(
        spark, sf_dir,
        {"q": "cust omer", "split_join_tokens": "fallback",
         "num_typos": 0, "filter_by": "lang:=en", "per_page": 10},
    )
    direct = search(
        spark, sf_dir,
        {"q": "customer", "num_typos": 0, "filter_by": "lang:=en",
         "per_page": 10},
    )
    assert _ids(f) == _ids(direct)
    assert f["found"] == direct["found"]


def test_facade_split_join_multifield(spark, sf_dir):
    """query_by multifield: the rewrite probes the ARTIFACT's summed-df
    vocabulary and the retry runs the multifield kernel."""
    qb = "name,title"
    mf = search(
        spark, sf_dir,
        {"q": "cust omer", "split_join_tokens": "fallback",
         "num_typos": 0, "query_by": qb, "per_page": 10},
    )
    direct = search(
        spark, sf_dir,
        {"q": "customer", "num_typos": 0, "query_by": qb, "per_page": 10},
    )
    assert _ids(mf) == _ids(direct)
    assert mf["found"] == direct["found"]


def test_facade_drop_cascade_precedes_split_join(spark, sf_dir):
    """Pinned order among fallbacks: the drop_tokens cascade runs
    INSIDE the pipeline pass, so an and-mode query rescued by dropping
    its unknown tail (found ≥ 1) never reaches the split_join retry —
    split_join is the LAST resort, firing only when the pass as a whole
    (cascade included) matches nothing."""
    r = search(
        spark, sf_dir,
        {"q": "spark qqqzzz", "mode": "and", "num_typos": 0,
         "drop_tokens_threshold": 1, "split_join_tokens": "fallback",
         "per_page": 10},
    )
    direct = search(
        spark, sf_dir, {"q": "spark", "num_typos": 0, "per_page": 10}
    )
    assert _ids(r) == _ids(direct)
    assert r["found"] == direct["found"] > 0
