"""One build-phase benchmark run for the HEAD-vs-r3 A/B settle
(VERDICT r4 'what's wrong' #4 / next-round #2).

Usage: python scripts/ab_build_bench.py <repo_path> [n_turns]

Runs assign_doc_ids + build_segments ONCE from the code at
``repo_path`` over the shared cached transcript parquet and prints one
JSON line {"repo": ..., "secs": ..., "turns_per_sec": ...}. The outer
loop (bash) interleaves HEAD and the r3 worktree on the same host so
CPU-steal windows hit both arms equally.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

repo = sys.argv[1]
n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
sys.path.insert(0, repo)

from pyf_aggregator_spark.index.builder import assign_doc_ids  # noqa: E402
from pyf_aggregator_spark.index.segments import build_segments  # noqa: E402
from pyf_aggregator_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="ab-build", master="local[32]")

path = f"/tmp/pyfagg_bench/transcripts_{n_turns}"
if not os.path.exists(os.path.join(path, "_SUCCESS")):
    from pyf_aggregator_spark.fixtures.transcripts import transcripts_df

    transcripts_df(spark, n_turns).repartition(32).write.mode(
        "overwrite"
    ).parquet(path)

# warmup (JIT/codegen)
spark.read.parquet(path).limit(1000).groupBy("role").count().collect()

rep_dir = tempfile.mkdtemp(prefix="pyfagg_ab_seg_")
t0 = time.monotonic()
docs = assign_doc_ids(spark.read.parquet(path))
build_segments(docs, rep_dir, lineage="ab")
dt = time.monotonic() - t0
shutil.rmtree(rep_dir, ignore_errors=True)
print(json.dumps({"repo": repo, "secs": round(dt, 3),
                  "turns_per_sec": round(n_turns / dt, 1)}))
