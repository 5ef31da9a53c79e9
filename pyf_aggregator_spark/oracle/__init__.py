from pyf_aggregator_spark.oracle.bm25 import NumpyBM25

__all__ = ["NumpyBM25"]
