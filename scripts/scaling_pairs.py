"""Paired-adjacent scaling protocol.

Host CPU steal here varies ~2-3x on a minutes scale, so comparing runs
from different time windows confounds steal with scaling. Instead run
the two levels of a pair BACK TO BACK (the pair fits inside one steal
window) and take the ratio — steal multiplies both runs' times roughly
equally and cancels in the ratio. Repeat the pair N times and report
every per-pair efficiency plus the median (the median pair is the
steal-robust estimate; a window boundary inside a pair corrupts that
one pair only).

Writes BENCH/scaling_pairs.jsonl (one line per pair run).
Usage: python scripts/scaling_pairs.py [n_repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "BENCH", "scaling_pairs.jsonl")

PAIRS = [
    # (name, small master, big master, turns, factor)
    ("1->4", "local[1]", "local[4]", 200_000, 4),
    ("8->32", "local[8]", "local[32]", 500_000, 4),
]


def hw_ratio(k_small: int, k_big: int) -> float:
    """Adjacent raw-hardware control: throughput ratio of k_big vs
    k_small pure CPU processes (sha256, no Spark/GIL/engine) measured
    right next to the Spark pair. The VM's AVAILABLE cores vary with
    co-tenant load (measured: 32 procs gave 24.9 units/s vs 8 procs'
    10.7 → only 2.32x on a day the same binary's round-1 run got ~4x),
    so spark_ratio / hw_ratio isolates the ENGINE's scaling from the
    hardware actually present during the pair."""
    import hashlib
    import multiprocessing as mp
    import time as _t

    def work(n=15000):
        b = b"x" * 65536
        for _ in range(n):
            b = hashlib.sha256(b).digest() * 2048

    def timed(k):
        ps = [mp.Process(target=work) for _ in range(k)]
        t0 = _t.perf_counter()
        [p.start() for p in ps]
        [p.join() for p in ps]
        return _t.perf_counter() - t0

    ts = timed(k_small)
    tb = timed(k_big)
    return round((k_big / tb) / (k_small / ts), 3)


def run(master: str, turns: int) -> dict:
    env = {**os.environ, "BENCH_BUILD_REPEATS": "1", "BENCH_BUILD_ONLY": "1"}
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py"), "--master", master,
         "--sf-dir", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
         "--turns", str(turns)],
        capture_output=True, text=True, timeout=2400, check=True, env=env,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for i in range(n):
        for name, m_small, m_big, turns, factor in PAIRS:
            t0 = time.strftime("%H:%M:%S")
            k_small = int(m_small.split("[")[1].rstrip("]"))
            k_big = int(m_big.split("[")[1].rstrip("]"))
            hw = hw_ratio(k_small, k_big)
            small = run(m_small, turns)
            big = run(m_big, turns)
            speedup = round(
                big["turns_indexed_per_sec"] / small["turns_indexed_per_sec"], 3
            )
            rec = {
                "pair": name, "i": i, "turns": turns, "start": t0,
                "small_tps": small["turns_indexed_per_sec"],
                "big_tps": big["turns_indexed_per_sec"],
                "speedup": speedup,
                "efficiency": round(speedup / factor, 3),
                "hw_ratio": hw,
                "efficiency_vs_hw": round(speedup / hw, 3) if hw else None,
            }
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
