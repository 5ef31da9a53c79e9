"""Custom stateful operator (applyInPandasWithState sessionization) ==
its deterministic batch twin on the same bounded input."""

from __future__ import annotations

from pyf_aggregator_spark.streaming.stateful import (
    batch_sessionize,
    stream_sessionize,
)

SF = "/root/testdata/sf0.001"


def test_stream_sessionize_matches_batch_twin(spark):
    got = stream_sessionize(spark, SF).collect()
    events = spark.read.parquet(f"{SF}/events.parquet")
    want = batch_sessionize(events).collect()
    assert len(got) > 0
    key = lambda r: (r["user_id"], r["session_start"])  # noqa: E731
    got_t = [
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["total_value"])
        for r in sorted(got, key=key)
    ]
    want_t = [
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["total_value"])
        for r in sorted(want, key=key)
    ]
    assert got_t == want_t
    # multi-session users exist (the gap logic actually splits)
    users = [t[0] for t in got_t]
    assert len(users) > len(set(users))
