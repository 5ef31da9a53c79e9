"""One build_query_cache benchmark run for the HEAD-vs-r3 A/B settle
(VERDICT r4 named build_query_cache growth 12.7 → 16.0 s as the other
suspect; the round-5 segment A/B settled build_segments at parity).

Usage: python scripts/ab_query_cache.py <repo_path> [n_turns]

Runs build_index(docs).cache().materialize() ONCE from the code at
``repo_path`` over the shared cached transcript parquet (identical to
bench.py's build_query_cache phase) and prints one JSON line. The
outer bash loop interleaves HEAD and the r3 worktree on the same host
so CPU-steal windows hit both arms equally.
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = sys.argv[1]
n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
sys.path.insert(0, repo)

from pyf_aggregator_spark.index.builder import assign_doc_ids, build_index  # noqa: E402
from pyf_aggregator_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="ab-qcache", master="local[32]")

path = f"/tmp/pyfagg_bench/transcripts_{n_turns}"
if not os.path.exists(os.path.join(path, "_SUCCESS")):
    from pyf_aggregator_spark.fixtures.transcripts import transcripts_df

    transcripts_df(spark, n_turns).repartition(32).write.mode(
        "overwrite"
    ).parquet(path)

# warmup (JIT/codegen)
spark.read.parquet(path).limit(1000).groupBy("role").count().collect()

docs = assign_doc_ids(spark.read.parquet(path))
t0 = time.monotonic()
build_index(docs).cache().materialize()
dt = time.monotonic() - t0
print(json.dumps({"repo": repo, "secs": round(dt, 3),
                  "turns_per_sec": round(n_turns / dt, 1)}))
