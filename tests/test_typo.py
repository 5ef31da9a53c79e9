"""Typo-tolerant search (Typesense's default num_typos behavior):
deletion-neighborhood correction → WAND, rank-identical to querying the
corrected terms directly."""

from __future__ import annotations

import pytest

from pyf_aggregator_spark.fixtures.transcripts import transcripts_df
from pyf_aggregator_spark.index.builder import assign_doc_ids
from pyf_aggregator_spark.index.segments import build_segments
from pyf_aggregator_spark.search.typo import (
    build_deletion_table,
    correct_terms,
    wand_topk_typo,
    write_deletion_table,
)
from pyf_aggregator_spark.search.wand import load_index, wand_topk


@pytest.fixture(scope="module")
def typo_idx(spark, tmp_path_factory):
    docs = assign_doc_ids(transcripts_df(spark, 600), num_partitions=2)
    d = str(tmp_path_factory.mktemp("typoidx"))
    build_segments(docs.select("doc_id", "text"), d, num_partitions=2, lineage="t")
    idx = load_index(spark, d)
    write_deletion_table(idx["term_stats"], d)
    return spark, d, idx


def test_deletion_table_covers_edit1_grid(spark):
    ts = spark.createDataFrame(
        [("spark", 10, 0, 0.0), ("sport", 2, 0, 0.0)],
        "term string, df long, cf long, idf double",
    )
    tbl = build_deletion_table(ts).collect()
    variants = {(r["variant"], r["term"]) for r in tbl}
    # the term itself and each single deletion are present
    assert ("spark", "spark") in variants
    assert ("park", "spark") in variants and ("sark", "spark") in variants
    assert ("spak", "spark") in variants and ("spar", "spark") in variants


def test_correct_terms_edit1_cases(typo_idx):
    """substitution / insertion / deletion at distance 1 all correct to
    a vocabulary term; garbage stays None; known terms pass through.
    Corpus vocabulary contains w00000..w000NN tokens."""
    spark, d, idx = typo_idx
    got = correct_terms(
        spark, d,
        ["w00000",            # known → itself
         "w0000x",            # substitution of last char
         "w000001",           # insertion
         "w0000",             # deletion
         "zzqqy"],            # garbage, no neighbor
        idx["term_stats"],
    )
    assert got["w00000"] == "w00000"
    assert got["w0000x"] is not None and got["w0000x"].startswith("w0000")
    assert got["w000001"] is not None
    assert got["w0000"] is not None
    assert got["zzqqy"] is None


def test_typo_search_rank_identical_to_corrected_query(typo_idx):
    spark, d, idx = typo_idx
    got = wand_topk_typo(idx, "w0000x w00001", k=10, mode="or").collect()
    mapping = correct_terms(
        spark, d, ["w0000x", "w00001"], idx["term_stats"]
    )
    direct = wand_topk(
        idx, f"{mapping['w0000x']} w00001", k=10, mode="or"
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in direct
    ]
    assert len(got) == 10


def test_typo_search_all_garbage_empty(typo_idx):
    _, _, idx = typo_idx
    assert wand_topk_typo(idx, "zzqqy xxjjw", k=5).collect() == []


def test_correct_terms_edit2_and_distance_preference(typo_idx):
    """num_typos=2 (the Typesense default): a two-edit token of length
    ≥ 7 corrects; a distance-1 candidate beats any distance-2 one."""
    spark, d, idx = typo_idx
    got = correct_terms(
        spark, d,
        ["wx00000x",  # len 8: two insertions into w00000 → distance 2
         "w00001x"],  # len 7: dist 1 to w00001, dist 2 to w00000
        idx["term_stats"],
    )
    assert got["wx00000x"] == "w00000"
    assert got["w00001x"] == "w00001"  # lower distance wins, not df


def test_correct_terms_length_gates(spark, tmp_path):
    """Typesense's min_len_1typo=4 / min_len_2typo=7 gates: short
    tokens get a smaller edit budget (exact match under 4 chars)."""
    rows = [(0, "color book"), (1, "color book")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "gates")
    build_segments(docs, d, num_partitions=1, lineage="g")
    idx = load_index(spark, d)
    write_deletion_table(idx["term_stats"], d)
    got = correct_terms(
        spark, d,
        ["bok",    # len 3 < 4 → no tolerance, despite lev 1 to 'book'
         "bokz",   # len 4 → budget 1, but lev('bokz','book') = 2 → None
         "bookz"],  # len 5 → budget 1, lev 1 → corrects
        idx["term_stats"],
    )
    assert got["bok"] is None
    assert got["bokz"] is None
    assert got["bookz"] == "book"


def test_correction_prefers_higher_df(spark, tmp_path):
    """Among several distance-1 candidates the most frequent term wins
    (Typesense prefers popular corrections)."""
    rows = [(i, "color book") for i in range(8)] + [(8, "colors"), (9, "colors")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "pref")
    build_segments(docs, d, num_partitions=1, lineage="p")
    idx = load_index(spark, d)
    write_deletion_table(idx["term_stats"], d)
    # "colorz" is distance 1 from BOTH color (df 8, delete z) and
    # colors (df 2, substitute z→s) → the higher-df term wins
    got = correct_terms(spark, d, ["colorz"], idx["term_stats"])
    assert got["colorz"] == "color"


def test_typo_artifact_invalidated_on_upsert(spark, tmp_path):
    """ADVICE r4: swapping term_stats (upsert_docs) must invalidate the
    SymSpell deletion table, or corrections can never reach newly-added
    vocabulary and rank by stale df until a full rebuild."""
    import os

    from pyf_aggregator_spark.index.incremental import upsert_docs
    from pyf_aggregator_spark.search.typo import TYPO_DIR

    d = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha gamma")], "doc_id long, text string"
    )
    build_segments(docs, d, num_partitions=1, lineage="t")
    idx = load_index(spark, d)
    # build the artifact, then verify a future-vocab token fails now
    got = correct_terms(spark, d, ["zephyrx"], idx["term_stats"])
    assert got["zephyrx"] is None
    assert os.path.isdir(f"{d}/{TYPO_DIR}")
    # upsert introduces the new vocabulary word
    upsert_docs(
        spark, d,
        spark.createDataFrame([(2, "zephyr zephyr")], "doc_id long, text string"),
    )
    # artifact was invalidated by the stats swap and self-heals
    assert not os.path.isdir(f"{d}/{TYPO_DIR}")
    idx2 = load_index(spark, d)
    got2 = correct_terms(spark, d, ["zephyrx"], idx2["term_stats"])
    assert got2["zephyrx"] == "zephyr"


def test_correct_terms_dictionary_membership_matches_scan(spark, tmp_path):
    """The r6 dictionary-served known/unknown split (known_terms kwarg
    via wand._known_terms) must produce the exact mapping the
    term_stats scan path produces — including known tokens, correctable
    typos, and hopeless tokens."""
    from pyf_aggregator_spark.search.wand import _known_terms, load_index

    d = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha delta")],
        "doc_id long, text string",
    )
    build_segments(docs, d, num_partitions=1, lineage="t")
    idx = load_index(spark, d)
    terms = ["alpha", "alphax", "beta", "qqqqzzzz"]
    via_scan = correct_terms(spark, d, terms, idx["term_stats"])
    known = _known_terms(idx, terms)
    assert known == {"alpha", "beta"}  # dictionary resolved membership
    via_dict = correct_terms(
        spark, d, terms, idx["term_stats"], known_terms=known
    )
    assert via_dict == via_scan
    assert via_dict["alpha"] == "alpha" and via_dict["alphax"] == "alpha"
    assert via_dict["qqqqzzzz"] is None
