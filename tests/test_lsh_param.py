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
    the cap, those buckets fall back to signature-equality STAR pairs
    (299, linear — identical docs are never missed) while pairs sharing
    a NON-hot band are still found, and precision is untouched (Hamming
    verify)."""
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
    # exact-dup star fallback: every boilerplate doc pairs with the
    # group min (doc 0) at hamming 0 — identical docs are never missed
    star = {(d1, d2) for d1, d2 in got if d1 == 0}
    assert star == {(0, i) for i in range(1, 300)}
    assert all(
        r["hamming"] == 0 for r in pairs if r["doc1"] == 0
    )
    sig.unpersist()


def test_cosine_lsh_label_free(spark):
    """Hyperplane LSH finds planted near-duplicates without any
    blocking attribute; identical-direction pairs are never missed
    (they share every band); reported pairs are exact-verified; the
    hot-bucket cap bounds a flooded bucket."""
    import math
    import hashlib

    from pyf_aggregator_spark.operators.dedup import cosine_lsh_pairs

    def vec(seed, dim=16):
        # deterministic pseudo-vector from md5 digits
        h = hashlib.md5(str(seed).encode()).hexdigest()
        return [int(h[i % 32], 16) - 7.5 for i in range(dim)]

    rows = []
    for i in range(40):
        rows.append((i, vec(i)))
    # planted exact-direction dups (scaled copies -> cosine 1.0)
    rows.append((100, [2.0 * x for x in vec(3)]))
    rows.append((101, [0.5 * x for x in vec(17)]))
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    got = {(r["vec1"], r["vec2"]): r["cosine"]
           for r in cosine_lsh_pairs(emb, threshold=0.99).collect()}
    assert (3, 100) in got and got[(3, 100)] >= 0.99
    assert (17, 101) in got
    # precision: every reported pair really is >= threshold
    assert all(c >= 0.99 for c in got.values())
    # flooded bucket: 50 copies of one direction -> capped candidates
    flood = [(200 + i, vec(9)) for i in range(50)]
    emb2 = spark.createDataFrame(rows + flood, "vec_id long, v array<double>")
    capped = cosine_lsh_pairs(emb2, threshold=0.99, hot_bucket_cap=10)
    pairs = {(r["vec1"], r["vec2"]) for r in capped.collect()}
    assert not any(v1 >= 200 and v2 >= 200 for v1, v2 in pairs)
