"""Input-boundary dispatch (pyf_aggregator_spark.io): parquet paths vs
``table:`` catalog refs (the Iceberg deployment form), and the
snapshot-option assembly for time travel / incremental append scans.

The sandbox has no Iceberg jars (documented), so the option-CARRYING
table reads cannot execute here; what is tested is everything this
repo owns: the dispatch itself (both branches, against the session
catalog), the exact option dict Iceberg documents, and the explicit
rejections (options on a parquet path, end without start, time travel
× incremental), so a misconfigured job fails loudly instead of
silently reading the full table.
"""

from __future__ import annotations

import pytest

from pyf_aggregator_spark.io import read_input, snapshot_read_options


def test_snapshot_options_time_travel():
    assert snapshot_read_options(snapshot_id=10963874102873) == {
        "snapshot-id": "10963874102873"
    }
    assert snapshot_read_options(as_of_timestamp=1735689600000) == {
        "as-of-timestamp": "1735689600000"
    }


def test_snapshot_options_incremental():
    assert snapshot_read_options(start_snapshot_id=5) == {
        "start-snapshot-id": "5"
    }
    assert snapshot_read_options(start_snapshot_id=5, end_snapshot_id=9) == {
        "start-snapshot-id": "5",
        "end-snapshot-id": "9",
    }


def test_snapshot_options_rejections():
    with pytest.raises(ValueError, match="mutually exclusive"):
        snapshot_read_options(snapshot_id=1, as_of_timestamp=2)
    with pytest.raises(ValueError, match="requires start"):
        snapshot_read_options(end_snapshot_id=9)
    with pytest.raises(ValueError, match="does not combine"):
        snapshot_read_options(snapshot_id=1, start_snapshot_id=5)


def test_read_input_parquet_path(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [("c1", 0, "hello world")], "conv_id string, turn_idx int, text string"
    ).write.parquet(p)
    got = read_input(spark, p)
    assert [r["text"] for r in got.collect()] == ["hello world"]


def test_read_input_table_ref(spark):
    spark.createDataFrame(
        [("c1", 0, "alpha"), ("c1", 1, "beta")],
        "conv_id string, turn_idx int, text string",
    ).createOrReplaceTempView("io_dispatch_view")
    got = read_input(spark, "table:io_dispatch_view")
    assert sorted(r["text"] for r in got.collect()) == ["alpha", "beta"]


def test_read_input_rejects_options_on_paths(spark, tmp_path):
    with pytest.raises(ValueError, match="table: refs only"):
        read_input(spark, str(tmp_path / "x.parquet"), snapshot_id=3)
    with pytest.raises(ValueError, match="empty table name"):
        read_input(spark, "table:")
