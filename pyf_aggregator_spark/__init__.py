"""pyf_aggregator_spark — a PySpark-native full-text index + BM25 engine.

Brand-new engine with the query/data-processing capabilities of the
reference ``collective/pyf.aggregator`` (which delegates all search to
Typesense): document ingestion at scale, inverted-index construction,
top-k ranked BM25 multi-field search with filters/facets/group-by/sort,
plus the training-data-pipeline operators (dedup, similarity search,
text analysis) a 100 TB corpus needs.

Everything is DataFrame / Spark SQL + Arrow-vectorized pandas UDFs —
no RDDs, no per-row Python in hot paths.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75

# Tokenizer contract (reference: db.py:241 token_separators [". - _ @ /"]
# plus default whitespace): lowercase, split on whitespace and . - _ @ /
TOKEN_SEP_RE = r"[\s.\-_@/]+"
