from pyf_aggregator_spark.index.builder import (
    CorpusIndex,
    assign_doc_ids,
    build_index,
)

__all__ = ["CorpusIndex", "assign_doc_ids", "build_index"]
