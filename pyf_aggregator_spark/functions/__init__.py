from pyf_aggregator_spark.functions.tokenize import tokenize_col, tokenize_py

__all__ = ["tokenize_col", "tokenize_py"]
