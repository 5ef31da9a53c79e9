"""Inverted-index construction as DataFrame dataflow.

Replaces the reference's fetch→plugin-chain→Typesense-upsert pipeline
(``fetcher.py:105-150`` → ``indexer.py:46-63``): here the "collection"
is a set of Spark tables —

    doc_stats  : doc_id, doc_len            (BM25 length normalization)
    term_freq  : term, doc_id, tf           (the uncompressed postings)
    term_stats : term, df, cf               (document/collection freq)
    corpus     : n_docs, avgdl              (1 row of globals)

All aggregation is two-phase (map-side partial + final) — Catalyst
generates that automatically for groupBy; nothing is collected to the
driver except the 1-row globals when explicitly requested.

Scale notes (100 TB / 10^12 turns):
- term_freq shuffles on (doc_id, term): pure hash partitioning, no skew
  issue (doc_id is unique, so hot terms spread across docs).
- term_stats shuffles on term: Zipf-head terms ("the") are hot keys, but
  the partial aggregation collapses each (partition, term) to one row
  before the shuffle, so the reduce side receives ≤ P rows per term —
  bounded, no salting needed for *stats*. Salting matters only for the
  posting-*list* assembly (segments.py), where all (term, doc) rows of a
  hot term must meet.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyf_aggregator_spark import TOKEN_SEP_RE


def assign_doc_ids(
    transcripts: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """Stable global docIDs: dense 0-based rank over (conv_id, turn_idx).

    The per-row invariant (BASELINE.json input_hint) requires docID to be
    a pure function of the stable (conv_id, turn_idx) ordering, identical
    across re-runs and partitionings.

    A naive global ``row_number() over (order by ...)`` funnels every row
    through ONE task — impossible at 10^12 rows. Instead:

    1. range-repartition by (conv_id, turn_idx) — partitions hold ordered,
       disjoint key ranges;
    2. per-partition counts → cumulative offsets (P scalars on the driver);
    3. within-partition row_number + broadcast-joined offset.

    doc_id = offset[p] + local_rank is exactly the global rank regardless
    of where the range boundaries fall, so the result is deterministic
    even though range sampling is not.
    """
    cols = transcripts.columns
    if num_partitions is None:
        num_partitions = transcripts.sparkSession.sparkContext.defaultParallelism
    # persist: RangePartitioner samples per-evaluation, so without pinning
    # the partitioning, the counts job and the ranking job could see
    # DIFFERENT boundaries → duplicate/missing ids. At production scale
    # this stage is materialized to a table once anyway (SURVEY §7 phase 1).
    parted = (
        transcripts.repartitionByRange(num_partitions, "conv_id", "turn_idx")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    offsets_df = transcripts.sparkSession.createDataFrame(
        offsets, "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy("conv_id", "turn_idx")
    return (
        parted.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(offsets_df), "_pid")
        .withColumn("doc_id", (F.col("_offset") + F.col("_rn") - 1).cast("long"))
        .select("doc_id", *cols)
    )


@dataclass
class CorpusIndex:
    """Handles to the index tables for one corpus.

    ``postings``/``term_idf`` are the impact-ready query-side tables:
    the BM25 doc-length normalization and idf are folded in at build
    time, so scoring a query is one broadcast join + one groupBy —
    no doc_stats join on the query path (the classic impact-ordered
    index preprocessing, here as plain columns).
    """

    docs: DataFrame        # doc_id, text (+ passthrough columns)
    doc_stats: DataFrame   # doc_id, doc_len
    term_freq: DataFrame   # term, doc_id, tf
    term_stats: DataFrame  # term, df, cf
    corpus: DataFrame      # n_docs, total_len, avgdl  (1 row)
    postings: DataFrame    # term, doc_id, tf, norm (norm = tf-part of BM25)
    term_idf: DataFrame    # term, df, idf

    def cache(self) -> "CorpusIndex":
        # term_freq is the shared upstream of every other table — cache it
        # so tokenize+explode+agg runs once, not once per derived table.
        self.term_freq.cache()
        self.doc_stats.cache()
        self.term_stats.cache()
        self.corpus.cache()
        self.postings.cache()
        self.term_idf.cache()
        return self

    def materialize(self) -> "CorpusIndex":
        """Force-build every cached table; upstream-first so each derived
        table reuses the cached parent instead of recomputing the scan."""
        self.term_freq.count()
        self.doc_stats.count()
        self.corpus.collect()
        self.term_stats.count()
        self.postings.count()
        self.term_idf.count()
        return self

    def unpersist(self) -> None:
        for df in (
            self.doc_stats, self.term_stats, self.corpus,
            self.postings, self.term_idf,
        ):
            df.unpersist()


def build_index(
    docs: DataFrame, text_col: str = "text", doc_id_col: str = "doc_id"
) -> CorpusIndex:
    """docs(doc_id, text) → index tables.

    N = all docs (token-less docs count toward N and avgdl with len 0),
    matching the oracle definition: avgdl = total_tokens / N.
    """
    spark: SparkSession = docs.sparkSession
    base = docs.select(F.col(doc_id_col).alias("doc_id"), F.col(text_col).alias("text"))

    # explode-then-filter outruns filtering inside the array (the array
    # higher-order filter materializes a second array per row; exploding
    # the raw split keeps the empty-token drop inside one codegen stage)
    tokens = base.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), TOKEN_SEP_RE)).alias("term"),
    ).filter(F.col("term") != "")
    term_freq = tokens.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    doc_stats = (
        base.select("doc_id")
        .join(
            term_freq.groupBy("doc_id").agg(F.sum("tf").alias("doc_len")),
            "doc_id",
            "left",
        )
        .select("doc_id", F.coalesce("doc_len", F.lit(0)).cast("long").alias("doc_len"))
    )
    term_stats = term_freq.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
    corpus = doc_stats.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum("doc_len"), F.lit(0)).cast("long").alias("total_len"),
    ).select(
        "n_docs",
        "total_len",
        (F.col("total_len").cast("double") / F.col("n_docs")).alias("avgdl"),
    )
    from pyf_aggregator_spark import B, K1

    # impact-ready postings: fold length normalization in at build time
    postings = (
        term_freq.join(doc_stats, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "term",
            "doc_id",
            "tf",
            (
                (F.col("tf") * F.lit(K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(K1)
                    * (F.lit(1.0 - B) + F.lit(B) * F.col("doc_len") / F.col("avgdl"))
                )
            ).alias("norm"),
        )
    )
    term_idf = (
        term_stats.crossJoin(F.broadcast(corpus))
        .select(
            "term",
            "df",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
        )
    )
    return CorpusIndex(
        docs=docs, doc_stats=doc_stats, term_freq=term_freq,
        term_stats=term_stats, corpus=corpus,
        postings=postings, term_idf=term_idf,
    )
