"""Incremental index maintenance — the reference's refresh/upsert story.

The reference maintains its collection with RSS-triggered point upserts
and weekly refreshes (queue.py:590-986, §3.3). Spark-native analog:
new documents arrive as a DELTA batch; we

  1. assign delta docIDs from a fresh base ABOVE the existing range
     (old part files are immutable — the zero-downtime append analog
     of the versioned-collection alias swap, typesense_util.py:174-319),
  2. build delta segment partitions (part_base above existing parts,
     per-partition checkpoints exactly like the full build),
  3. merge stats ADDITIVELY: df/cf/n_docs/total_len are sums, idf is
     recomputed from the merged counts — no rescan of old postings.

Query-side, nothing changes: wand_topk sees more partitions. The only
subtlety is pruning safety: old blocks stored max_norm computed under
the OLD avgdl; with the merged avgdl the true norms can be larger, so
the WAND bound inflates each part's block maxima by
max(1, avgdl_now / avgdl_build) (norm is monotone in avgdl with ratio
bounded by the avgdl ratio) — bounds stay upper bounds, pruning stays
exact.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyf_aggregator_spark.index.segments import build_segments


def _swap_write(df: DataFrame, path: str) -> None:
    """Write to a temp dir then atomically swap — Spark can't overwrite
    a path that feeds the plan being written."""
    tmp = path + "__new"
    df.write.mode("overwrite").parquet(tmp)
    old = path + "__old"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def delete_docs(
    spark: SparkSession, index_dir: str, doc_ids: DataFrame | list[int]
) -> int:
    """K3 delete-by-filter (db.py:349-375 analog): tombstone the docIDs.

    Segment files stay immutable (the Lucene deletes model): doc_ids
    land in ``tombstones/`` and the query path anti-joins them out.
    BM25 stats intentionally keep the deleted docs until the next full
    rebuild/compaction (T5) — same drift semantics as Lucene deletes.
    Returns the number of newly tombstoned ids."""
    if isinstance(doc_ids, list):
        df = spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long")
    else:
        df = doc_ids.select(F.col("doc_id").cast("long"))
    df = df.distinct()
    n = df.count()
    df.write.mode("append").parquet(f"{index_dir}/tombstones")
    return n


def load_tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    path = f"{index_dir}/tombstones"
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path).distinct()


def append_segments(
    delta_docs: DataFrame,
    index_dir: str,
    num_partitions: int | None = None,
    lineage: str = "delta",
) -> dict:
    """delta_docs(doc_id dense from 0, text) → appended delta partitions
    + merged stats. Returns counters incl. the docID base used."""
    spark: SparkSession = delta_docs.sparkSession
    meta = spark.read.parquet(f"{index_dir}/meta")
    agg = meta.agg(
        F.max("part_id").alias("max_part"), F.max("doc_hi").alias("max_doc")
    ).collect()[0]
    part_base = int(agg["max_part"]) + 1
    doc_base = int(agg["max_doc"]) + 1

    corpus_old = spark.read.parquet(f"{index_dir}/corpus").collect()[0]

    shifted = delta_docs.select(
        (F.col("doc_id") + F.lit(doc_base)).cast("long").alias("doc_id"), "text"
    )
    n_delta, delta_len = (
        shifted.select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.lower("text"), r"[\s.\-_@/]+"),
                    lambda t: t != F.lit(""),
                )
            ).alias("dl"),
        )
        .agg(F.count("*"), F.coalesce(F.sum("dl"), F.lit(0)))
        .collect()[0]
    )
    n_docs_new = corpus_old["n_docs"] + n_delta
    total_len_new = corpus_old["total_len"] + delta_len
    avgdl_new = total_len_new / n_docs_new

    # delta segments: blocks encoded under the MERGED avgdl so their
    # stored max_norm needs no inflation; old parts keep avgdl_build
    stats = build_segments(
        shifted,
        index_dir,
        num_partitions=num_partitions,
        lineage=lineage,
        doc_base=doc_base,
        part_base=part_base,
        write_stats=False,
        avgdl_override=avgdl_new,
    )

    # ---- merge stats additively
    tokens = shifted.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), r"[\s.\-_@/]+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = tokens.groupBy("term", "doc_id").agg(F.count("*").cast("long").alias("tf"))
    delta_term = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df_d"),
        F.sum("tf").cast("long").alias("cf_d"),
    )
    old_term = spark.read.parquet(f"{index_dir}/term_stats").select(
        "term", "df", "cf"
    )
    merged = (
        old_term.join(delta_term, "term", "full_outer")
        .select(
            "term",
            (F.coalesce("df", F.lit(0)) + F.coalesce("df_d", F.lit(0))).alias("df"),
            (F.coalesce("cf", F.lit(0)) + F.coalesce("cf_d", F.lit(0))).alias("cf"),
        )
        .select(
            "term", "df", "cf",
            F.log(
                F.lit(1.0)
                + (F.lit(n_docs_new) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    _swap_write(merged, f"{index_dir}/term_stats")

    delta_doc_stats = (
        shifted.select("doc_id")
        .join(tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len")), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("doc_len", F.lit(0)).cast("long").alias("doc_len")
        )
    )
    delta_doc_stats.write.mode("append").parquet(f"{index_dir}/doc_stats")

    spark.createDataFrame(
        [(int(n_docs_new), int(total_len_new), float(avgdl_new))],
        "n_docs long, total_len long, avgdl double",
    ).write.mode("overwrite").parquet(f"{index_dir}/corpus")

    return {
        **stats,
        "doc_base": doc_base,
        "part_base": part_base,
        "n_delta_docs": int(n_delta),
        "avgdl": float(avgdl_new),
    }
