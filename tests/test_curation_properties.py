"""Property-based spec for the curation position algebra
(search/api.py::_curate_rows) — declarative invariants checked with
hypothesis over random organic rows / pin maps / hidden sets. The
differential fuzz (test_facade_fuzz.py) compares against a model that
REIMPLEMENTS the same algorithm, so a shared logic bug would pass it;
these properties are derived from the Typesense contract instead:

  P1 no hidden doc in the output
  P2 every existing, non-hidden pinned doc placed at its position when
     enough rows exist to reach it (or compacted earlier at the end)
  P3 organic docs keep their relative order
  P4 output ≤ limit, no duplicates, curated flag exactly on pins
  P5 found arithmetic: found' = found − |hidden ∩ matched|
                                + |placed pins ∖ matched|
  P6 with no curation rows the output is the organic prefix unchanged
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyf_aggregator_spark.search.api import _curate_rows

DOC_IDS = st.integers(min_value=0, max_value=30)


@st.composite
def curation_case(draw):
    organic_ids = draw(
        st.lists(DOC_IDS, unique=True, min_size=0, max_size=12)
    )
    rows = [
        {"doc_id": d, "score": round(10.0 - i * 0.25, 4)}
        for i, d in enumerate(organic_ids)
    ]
    existing = set(organic_ids) | set(
        draw(st.lists(DOC_IDS, max_size=8))
    )
    pinned = draw(
        st.dictionaries(
            st.integers(min_value=1, max_value=10), DOC_IDS, max_size=4
        )
    )
    hidden = set(draw(st.lists(DOC_IDS, max_size=3)))
    # curated ids that "match the query": any subset of existing ∪ organic,
    # with organic rows always matching (they came out of the kernel)
    curated_ids = set(pinned.values()) | hidden
    matched_extra = {
        d
        for d in draw(st.lists(DOC_IDS, max_size=6))
        if d in existing and d in curated_ids
    }
    curated_scores = {
        d: (
            next(
                (r["score"] for r in rows if r["doc_id"] == d), 1.2345
            )
        )
        for d in (set(organic_ids) & curated_ids) | matched_extra
    }
    found = len(organic_ids) + draw(st.integers(min_value=0, max_value=5))
    limit = draw(st.integers(min_value=1, max_value=10))
    return rows, found, pinned, hidden, curated_scores, existing, limit


@settings(max_examples=300, deadline=None)
@given(curation_case())
def test_curation_invariants(case):
    rows, found, pinned, hidden, curated_scores, existing, limit = case
    out, found2 = _curate_rows(
        list(rows), found, dict(pinned), set(hidden),
        dict(curated_scores), set(existing), limit,
    )
    out_ids = [r["doc_id"] for r in out]

    # P4: bounded, unique, curated flag only on pins
    assert len(out) <= limit
    assert len(out_ids) == len(set(out_ids))

    # effective pins: existing, not hidden, lowest position per doc
    eff: dict[int, int] = {}
    seen: set[int] = set()
    for pos in sorted(pinned):
        d = pinned[pos]
        if d in hidden or d not in existing or d in seen:
            continue
        eff[pos] = d
        seen.add(d)

    # P1: hidden never appears
    assert not (set(out_ids) & hidden)

    # P2: a pin whose position lies inside the produced output sits
    # exactly there — unless the output ran out of rows first
    for pos, d in eff.items():
        if pos <= len(out):
            assert d in out_ids, f"pin {d}@{pos} missing"
            actual = out_ids.index(d) + 1
            assert actual <= pos, f"pin {d} placed after its position"

    # curated flag ⇔ pinned placement
    pin_ids = set(eff.values())
    for r in out:
        assert bool(r.get("curated")) == (r["doc_id"] in pin_ids)

    # P3: organic relative order preserved
    organic_seq = [
        d for d in out_ids
        if d not in pin_ids
    ]
    organic_src = [
        r["doc_id"] for r in rows
        if r["doc_id"] not in hidden and r["doc_id"] not in pin_ids
    ]
    assert organic_seq == organic_src[: len(organic_seq)]

    # P5: found arithmetic
    matched = set(curated_scores)
    expect = (
        found
        - sum(1 for d in hidden if d in matched)
        + sum(1 for d in eff.values() if d not in matched)
    )
    assert found2 == expect

    # P6: no curation → identity prefix
    out0, f0 = _curate_rows(
        list(rows), found, {}, set(), {}, set(existing), limit
    )
    assert [r["doc_id"] for r in out0] == [
        r["doc_id"] for r in rows
    ][:limit]
    assert f0 == found
