from pyf_aggregator_spark.fixtures.transcripts import (
    generate_transcripts,
    reference_queries,
    transcripts_df,
)

__all__ = ["generate_transcripts", "reference_queries", "transcripts_df"]
