#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north rule).

The rule's criterion — ≥0.8 throughput scaling efficiency from N to 4N
executors — cannot use a real cluster in this sandbox, so per the
driver instruction it is evidenced by running the SAME job on the SAME
input at two parallelism levels (local[8] vs local[32]) and reporting
throughput at both plus efficiency = (throughput_4N / throughput_N) / 4.

Each level runs in a fresh subprocess (fresh JVM — no cache leakage
between levels); the transcript corpus parquet is generated once and
shared. Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_level(master: str, sf_dir: str, turns: int | None) -> dict:
    cmd = [sys.executable, os.path.join(HERE, "bench.py"), "--master", master,
           "--sf-dir", sf_dir]
    if turns:
        cmd += ["--turns", str(turns)]
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3000, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    turns = int(os.environ["SPARK_GRAFT_TURNS"]) if "SPARK_GRAFT_TURNS" in os.environ else None
    small = run_level("local[8]", sf_dir, turns)
    big = run_level("local[32]", sf_dir, turns)

    def eff(metric: str) -> float:
        return round((big[metric] / small[metric]) / 4.0, 3)

    report = {
        "metric": "scaling_efficiency_8_to_32",
        "value": eff("turns_indexed_per_sec"),
        "unit": "ratio",
        "sf": small["sf"],
        "turns": small["turns_indexed"],
        "levels": {"N": "local[8]", "4N": "local[32]"},
        "build": {
            "local8_turns_per_sec": small["turns_indexed_per_sec"],
            "local32_turns_per_sec": big["turns_indexed_per_sec"],
            "efficiency": eff("turns_indexed_per_sec"),
        },
        "segments": {
            "local8_turns_per_sec": small["seg_turns_per_sec"],
            "local32_turns_per_sec": big["seg_turns_per_sec"],
            "efficiency": eff("seg_turns_per_sec"),
        },
        "query_batch": {
            "local8_qps": small["queries_per_sec"],
            "local32_qps": big["queries_per_sec"],
            "efficiency": eff("queries_per_sec"),
        },
    }

    md = f"""# BENCH — measured numbers (updates BASELINE.md's "to be measured")

Same job, same input, two parallelism levels (the sandbox evidence for
the N→4N executor scaling criterion — see BASELINE.md). Fresh JVM per
level; corpus: {int(small['turns_indexed'])} transcript turns (sf={small['sf']});
throughput excludes Spark startup and corpus generation.

| phase | local[8] (N) | local[32] (4N) | speedup | efficiency |
|---|---|---|---|---|
| index build (DataFrame tables) | {small['turns_indexed_per_sec']:.0f} turns/s | {big['turns_indexed_per_sec']:.0f} turns/s | {big['turns_indexed_per_sec']/small['turns_indexed_per_sec']:.2f}x | {report['build']['efficiency']:.2f} |
| segment build (varbyte blocks) | {small['seg_turns_per_sec']:.0f} turns/s | {big['seg_turns_per_sec']:.0f} turns/s | {big['seg_turns_per_sec']/small['seg_turns_per_sec']:.2f}x | {report['segments']['efficiency']:.2f} |
| batched BM25 query set | {small['queries_per_sec']:.2f} q/s | {big['queries_per_sec']:.2f} q/s | {big['queries_per_sec']/small['queries_per_sec']:.2f}x | {report['query_batch']['efficiency']:.2f} |

Raw bench lines:

```json
{json.dumps(small)}
{json.dumps(big)}
```

Notes on interpretation:
- local[8] → local[32] multiplies threads 4x inside ONE shared-memory
  JVM; on a real 4x-executor cluster the build scales on partition
  count (embarrassingly parallel map + one shuffle), which this
  evidences at the task level.
- Query-set throughput is latency-bound at this tiny scale (fixed
  per-job scheduling cost dominates); build throughput is the
  capacity-bound metric the 0.8 criterion targets.
"""
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
