#!/usr/bin/env python
"""Process-level scaling evidence: 1 -> 4 executor JVMs at fixed
cores-per-executor (local-cluster mode), per-stage timings.

Round-2 verdict: single-JVM local[N] hits this VM's measured
per-process thread ceiling (>4-8 busy threads in one process degrade;
32 separate processes scale at 0.93), so thread-count pairs conflate
the host ceiling with the engine's scaling. local-cluster[E,C,M] runs E
REAL executor JVMs with C cores each — the closest sandbox analog of
"N and 4N executors" in the north rule, with each JVM staying inside
the per-process regime.

Each level runs the build phase-by-phase in a fresh subprocess (fresh
JVMs), alternating A/B/A/B to spread CPU-steal drift evenly. Reports
per-phase best-of-N, throughput at both levels, and per-phase scaling
efficiency. Appends a JSON line per run to
BENCH/scaling_localcluster.jsonl and rewrites the summary table in
BENCH/BASELINE.md (section appended by hand afterwards).

Usage: python scripts/scaling_localcluster.py [--turns 1000000]
       [--alternations 3] [--cores 4] [--small 1] [--big 4]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyf_aggregator_spark.session import get_spark
from pyf_aggregator_spark.index.builder import assign_doc_ids
from pyf_aggregator_spark.index.segments import build_segments

corpus_path = {corpus!r}
master = {master!r}
# local-cluster's third arg is WORKER capacity; the executor HEAP is
# spark.executor.memory (default 1g — OOMs at 2M turns). Size the heap
# to the worker allowance minus overhead.
spark = get_spark(
    app_name="scale-lc", master=master,
    extra_conf={{
        "spark.executor.memory": {exec_mem!r},
        # UI on so the child can pull per-stage executor metrics from
        # the REST API: cpuTime vs runTime vs fetch-wait decomposes
        # "didn't scale" into plan-vs-host before the JVM dies
        "spark.ui.enabled": "true",
        "spark.ui.port": "0",
    }},
)
phases = {{}}


def _procstat():
    # machine-wide CPU ticks: (busy, idle, iowait, steal). The host is
    # otherwise idle during a run, so the delta across a phase is the
    # run's own footprint INCLUDING python workers (executorCpuTime
    # can't see them: applyInPandas burns CPU in python children while
    # the JVM task thread "waits")
    with open("/proc/stat") as f:
        p = [int(x) for x in f.readline().split()[1:]]
    return (p[0] + p[1] + p[2] + p[5] + p[6] + p[7], p[3], p[4], p[7])


cpu0 = _procstat()
t0 = time.monotonic()
docs = assign_doc_ids(spark.read.parquet(corpus_path))
docs = docs.persist(); n = docs.count()
phases["assign_doc_ids"] = time.monotonic() - t0

import shutil, tempfile
out = tempfile.mkdtemp(prefix="scale_lc_")
t0 = time.monotonic()
build_segments(docs, out, lineage="scale")
phases["build_segments"] = time.monotonic() - t0
total = sum(phases.values())
cpu1 = _procstat()
hz = os.sysconf("SC_CLK_TCK")
machine_cpu = {{
    "busy_s": (cpu1[0] - cpu0[0]) / hz,
    "idle_s": (cpu1[1] - cpu0[1]) / hz,
    "iowait_s": (cpu1[2] - cpu0[2]) / hz,
    "steal_s": (cpu1[3] - cpu0[3]) / hz,
    "avg_busy_cores": (cpu1[0] - cpu0[0]) / hz / total,
}}
shutil.rmtree(out, ignore_errors=True)

stage_totals = {{}}
try:
    import urllib.request
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{{base}}/api/v1/applications/{{app_id}}/stages?status=complete"
    ) as r:
        stages = json.loads(r.read())
    keys = {{
        "executorRunTime": "run_ms", "executorCpuTime": "cpu_ns",
        "jvmGcTime": "gc_ms", "shuffleFetchWaitTime": "fetch_wait_ms",
        "shuffleWriteTime": "shuffle_write_ns",
        "shuffleReadBytes": "shuffle_read_b",
        "shuffleWriteBytes": "shuffle_write_b",
        "executorDeserializeTime": "deser_ms",
    }}
    for st in stages:
        for src, dst in keys.items():
            stage_totals[dst] = stage_totals.get(dst, 0) + int(st.get(src, 0))
    stage_totals["n_stages"] = len(stages)
except Exception as e:  # metrics are best-effort diagnostics
    stage_totals = {{"error": str(e)}}

print(json.dumps({{
    "master": master, "turns": int(n), "phases": phases,
    "total_sec": total, "turns_per_sec": n / total,
    "build_turns_per_sec": n / phases["build_segments"],
    "stage_totals": stage_totals,
    "machine_cpu": machine_cpu,
}}))
spark.stop()
"""


def run_child(master: str, corpus: str, exec_mem: str = "3g") -> dict:
    code = _CHILD.format(
        repo=HERE, corpus=corpus, master=master, exec_mem=exec_mem
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3000, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=1_000_000)
    ap.add_argument("--alternations", type=int, default=3)
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--small", type=int, default=1)
    ap.add_argument("--big", type=int, default=4)
    ap.add_argument("--mem-mb", type=int, default=4096)
    args = ap.parse_args()

    sys.path.insert(0, HERE)
    from pyf_aggregator_spark.session import get_spark

    # corpus generated once, shared by every child
    spark = get_spark(app_name="scale-gen", master="local[8]")
    sys.path.insert(0, HERE)
    from bench import ensure_transcripts

    corpus = ensure_transcripts(spark, args.turns)
    spark.stop()

    m_small = f"local-cluster[{args.small},{args.cores},{args.mem_mb}]"
    m_big = f"local-cluster[{args.big},{args.cores},{args.mem_mb}]"
    factor = args.big // args.small

    smalls, bigs = [], []
    for i in range(args.alternations):
        exec_mem = f"{max(1024, args.mem_mb - 1024)}m"
        smalls.append(run_child(m_small, corpus, exec_mem))
        bigs.append(run_child(m_big, corpus, exec_mem))
        print(
            f"alt {i}: small {smalls[-1]['build_turns_per_sec']:.0f} t/s, "
            f"big {bigs[-1]['build_turns_per_sec']:.0f} t/s",
            file=sys.stderr,
        )

    def best(runs):
        b = max(runs, key=lambda r: r["build_turns_per_sec"])
        b = dict(b)
        b["all_build_turns_per_sec"] = [
            round(r["build_turns_per_sec"], 1) for r in runs
        ]
        # per-phase minima (each phase's own least-noisy run)
        b["phase_min"] = {
            p: min(r["phases"][p] for r in runs) for p in b["phases"]
        }
        return b

    s, g = best(smalls), best(bigs)
    eff_build = (g["build_turns_per_sec"] / s["build_turns_per_sec"]) / factor
    result = {
        "pair": f"{m_small} -> {m_big}",
        "factor": factor,
        "turns": args.turns,
        "small": s,
        "big": g,
        "phase_efficiency": {
            p: round((s["phase_min"][p] / g["phase_min"][p]) / factor, 3)
            for p in s["phase_min"]
        },
        "build_efficiency": round(eff_build, 3),
        "total_efficiency": round(
            (g["turns_per_sec"] / s["turns_per_sec"]) / factor, 3
        ),
    }
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(
        os.path.join(HERE, "BENCH", "scaling_localcluster.jsonl"), "a"
    ) as fh:
        fh.write(json.dumps(result) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
