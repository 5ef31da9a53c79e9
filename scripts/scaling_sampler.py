"""Long-horizon scaling sampler: cycle the four parallelism levels,
appending one JSON line per run to BENCH/scaling_samples.jsonl.

This host's CPU steal varies ~2.5x on a minutes scale (measured:
identical local[8] builds at 2.9k and 7.6k turns/s within one hour), so
any single A/B measurement confounds steal with scaling. Sampling each
level many times across hours and taking each level's best run
approximates the quiet-window capacity — the quantity the N→4N
efficiency criterion is about.

Usage: nohup python scripts/scaling_sampler.py [max_cycles] &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "BENCH", "scaling_samples.jsonl")

LEVELS = [
    ("local[1]", True),
    ("local[4]", True),
    ("local[8]", False),   # full bench → also samples query q/s
    ("local[32]", False),
]
TURNS = int(os.environ.get("SCALE_TURNS", 500_000))


def probe_cpu() -> float:
    """Single-thread CPU probe (sha256 loop) — records how stolen the
    host was around the run; purely diagnostic."""
    import hashlib

    t0 = time.perf_counter()
    b = b"x" * 65536
    for _ in range(2000):
        b = hashlib.sha256(b).digest() * 2048
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    max_cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for cycle in range(max_cycles):
        for master, build_only in LEVELS:
            env = {**os.environ, "BENCH_BUILD_REPEATS": "1"}
            if build_only:
                env["BENCH_BUILD_ONLY"] = "1"
            p0 = probe_cpu()
            try:
                out = subprocess.run(
                    [sys.executable, os.path.join(HERE, "bench.py"),
                     "--master", master, "--sf-dir",
                     os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
                     "--turns", str(TURNS)],
                    capture_output=True, text=True, timeout=2400, env=env,
                )
                rec = json.loads(out.stdout.strip().splitlines()[-1])
            except Exception as e:  # keep sampling through failures
                rec = {"error": str(e), "master": master}
            rec["cycle"] = cycle
            rec["probe_before_sec"] = p0
            rec["probe_after_sec"] = probe_cpu()
            rec["wall"] = time.strftime("%H:%M:%S")
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
