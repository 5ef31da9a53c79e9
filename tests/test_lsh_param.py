"""Parametrized/salted MinHash-LSH: more permutations raise recall
(superset of the 8-perm registry result after exact verify); the hot-
bucket cap bounds candidate fan-out without hurting precision."""

from __future__ import annotations

from pyf_aggregator_spark.operators.dedup import (
    _shingles_df,
    dedup_minhash_lsh,
    minhash_lsh_pairs,
)

SF = "/root/testdata/sf0.001"


def test_more_perms_superset_recall(spark):
    sh = _shingles_df(spark, SF).cache()
    base = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in dedup_minhash_lsh(spark, SF).collect()
    }
    rich = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in minhash_lsh_pairs(sh, n_perm=16, n_bands=8).collect()
    }
    # exact verify makes every returned pair TRUE ≥-threshold; 8 bands
    # of 2 strictly contain 4 bands of 2 → superset recall
    assert set(base) <= set(rich)
    for k, v in base.items():
        assert rich[k] == v  # same exact jaccard
    assert all(v >= 0.5 for v in rich.values())


def test_hot_bucket_cap_bounds_fanout(spark):
    sh = _shingles_df(spark, SF).cache()
    assert minhash_lsh_pairs(sh, n_perm=8, n_bands=4, hot_bucket_cap=1).count() == 0
    capped = minhash_lsh_pairs(sh, n_perm=8, n_bands=4, hot_bucket_cap=2).collect()
    full = minhash_lsh_pairs(sh, n_perm=8, n_bands=4).collect()
    assert {(r["doc1"], r["doc2"]) for r in capped} <= {
        (r["doc1"], r["doc2"]) for r in full
    }


def test_simhash_hot_bucket_cap_bounds_candidates(spark):
    """Adversarial boilerplate corpus: 300 identical docs collapse into
    one bucket per band → uncapped candidate space is ~4·300²/2. With
    the cap, those buckets are excluded (bounded candidate count) while
    pairs sharing a NON-hot band are still found, and precision is
    untouched (Hamming verify)."""
    from pyf_aggregator_spark.operators.dedup import (
        _simhash_candidates,
        simhash_pairs,
        simhash_signatures,
    )

    boiler = [(i, "identical boilerplate header terms alpha beta") for i in range(300)]
    distinct = [
        (1000 + i, f"unique{i} content{i} words{i} tail{i} extra{i}")
        for i in range(20)
    ]
    # one genuine near-dup pair far from the boilerplate cluster
    neardup = [(2000, "quantum flux panda omega rare"), (2001, "quantum flux panda omega rarer")]
    docs = spark.createDataFrame(
        boiler + distinct + neardup, "doc_id long, text string"
    )
    sig = simhash_signatures(docs).persist()
    n_uncapped = _simhash_candidates(sig, None).count()
    n_capped = _simhash_candidates(sig, 50).count()
    assert n_uncapped >= 300 * 299 // 2  # the boilerplate blowup is real
    assert n_capped < 2000  # and the cap removes it
    pairs = simhash_pairs(docs, hot_bucket_cap=50).collect()
    got = {(r["doc1"], r["doc2"]) for r in pairs}
    assert (2000, 2001) in got  # recall survives outside hot buckets
    sig.unpersist()
