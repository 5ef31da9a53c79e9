"""T2 — at-least-once delivery + idempotent sink == effective
exactly-once across restarts (reference queue.py's Celery at-least-once
+ idempotent Typesense upsert; Spark-native: checkpointed file source +
transactional file sink).

The stream is stopped between micro-batch groups by draining only the
files present (AvailableNow), then restarted with MORE input on the
SAME checkpoint: the source's file log must skip everything already
processed and the sink must not duplicate rows — and a third run with
no new input must write nothing.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from pyf_aggregator_spark.streaming.pipeline import EVENTS_SCHEMA


def _stage_chunk(df, src_dir: str, name: str, tmp: str) -> None:
    """Write one parquet FILE (not dir) into the streaming source dir."""
    d = os.path.join(tmp, f"stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    part = glob.glob(os.path.join(d, "part-*.parquet"))[0]
    os.makedirs(src_dir, exist_ok=True)
    shutil.move(part, os.path.join(src_dir, f"{name}.parquet"))
    shutil.rmtree(d, ignore_errors=True)


def test_stream_resume_exactly_once_file_sink(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = events.count()
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .select("event_id", "ts", "user_id", "event_type", "value")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # first run sees only half the input
    _stage_chunk(events.filter(F.col("event_id") % 4 == 0), src, "c0", str(tmp_path))
    _stage_chunk(events.filter(F.col("event_id") % 4 == 1), src, "c1", str(tmp_path))
    run()
    n1 = spark.read.parquet(sink).count()
    assert 0 < n1 < total

    # restart on the same checkpoint with the remaining input
    _stage_chunk(events.filter(F.col("event_id") % 4 == 2), src, "c2", str(tmp_path))
    _stage_chunk(events.filter(F.col("event_id") % 4 == 3), src, "c3", str(tmp_path))
    run()
    got = spark.read.parquet(sink)
    assert got.count() == total  # nothing lost, nothing duplicated
    assert got.select("event_id").distinct().count() == total

    # a third run with no new files must be a no-op
    run()
    assert spark.read.parquet(sink).count() == total
