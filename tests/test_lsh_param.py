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
