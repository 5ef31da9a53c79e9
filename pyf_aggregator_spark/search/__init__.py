from pyf_aggregator_spark.search.engine import bm25_topk, bm25_topk_batch

__all__ = ["bm25_topk", "bm25_topk_batch"]
