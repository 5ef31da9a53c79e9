"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k over sf0.001 documents.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2, backed by pyf_aggregator_spark.registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyf_aggregator_spark.registry import REGISTRY, finalize_order  # noqa: E402

finalize_order()  # grading order: engine core + round-1-ungraded families first


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: disjunctive BM25 top-20 over sf0.001 documents."""
    from pyf_aggregator_spark.registry import documents_index
    from pyf_aggregator_spark.search.engine import bm25_topk

    index = documents_index(spark, "/root/testdata/sf0.001")
    return bm25_topk(index, "spark vector window", k=20, mode="or")


def _shipped(fn: Callable) -> Callable:
    """Ship the package zip to Python workers before any query runs —
    UDF/applyInPandas kernels are unpickled by module reference, and the
    driver may invoke us from any working directory."""

    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyf_aggregator_spark.session import ensure_py_files

        ensure_py_files(spark)
        return fn(spark, sf_dir)

    return wrapper


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _shipped(fn) for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
