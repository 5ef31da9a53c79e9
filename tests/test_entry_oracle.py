"""Driver-compare mimic: every queries() entry vs its DuckDB oracle.

Reproduces the driver's check — run the Spark callable and the oracle
SQL on the same parquet, sort columns by name, compare row sets
order-insensitively. Runs at sf0.001 here to stay fast (the driver uses
sf0.01); a slow marker can re-run at sf0.01.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif str(pdf[c].dtype).startswith("float"):
            pdf[c] = pdf[c].round(6)
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def _pairs():
    from __spark_entry__ import oracle_sql, queries

    q, o = queries(), oracle_sql()
    return [(name, fn, o.get(name)) for name, fn in q.items()]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, sf_dir, name, fn, sql):
    got = fn(spark, sf_dir).toPandas()
    assert got is not None
    if sql is None:
        return  # rows-only check, mirrors the driver's weaker gate
    con = duck_con(sf_dir)
    want = con.execute(sql).fetchdf()
    g, w = normalize(got), normalize(want)
    assert list(g.columns) == list(w.columns), f"{name}: column names differ"
    assert len(g) == len(w), f"{name}: row count {len(g)} != {len(w)}"
    pd.testing.assert_frame_equal(g, w, check_dtype=False, atol=1e-9)


def test_entry_smoke(spark):
    from __spark_entry__ import entry

    df = entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and "doc_id" in df.columns
