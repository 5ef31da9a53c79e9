"""Local replica of the driver's CORRECTNESS gate: run every
``__spark_entry__.queries()`` entry at sf0.01 next to its DuckDB
``oracle_sql()`` and compare row count, schema (sorted column names),
and values (string-normalized, order-insensitive after sorting by all
columns). Prints one line per query + total wall time.

Usage: python scripts/driver_mimic.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry_mod
    from pyf_aggregator_spark.session import get_spark

    spark = get_spark()
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    t_all = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"{name:42s} rows={len(sdf):6d} no_oracle "
                      f"[{time.time()-t0:6.1f}s]")
                continue
            odf = con.execute(oracles[name]).df()
            ok = len(sdf) == len(odf) and sorted(sdf.columns) == sorted(odf.columns)
            if ok and len(sdf):
                a = sdf[sorted(sdf.columns)].astype(str)
                b = odf[sorted(odf.columns)].astype(str)
                a = a.sort_values(list(a.columns)).reset_index(drop=True)
                b = b.sort_values(list(b.columns)).reset_index(drop=True)
                ok = a.equals(b)
            status = "OK " if ok else "FAIL"
            if not ok:
                failures.append(name)
            print(f"{name:42s} rows={len(sdf):6d}/{len(odf):6d} {status} "
                  f"[{time.time()-t0:6.1f}s]")
        except Exception as e:
            failures.append(name)
            print(f"{name:42s} ERROR {type(e).__name__}: {e} "
                  f"[{time.time()-t0:6.1f}s]")
    print(f"TOTAL {time.time()-t_all:.1f}s  failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
