#!/usr/bin/env python
"""Fixed-overhead decomposition of the local-cluster scaling pairs.

Model per level: T_build(W) = F + W / r, where F is the fixed cost a
bigger corpus cannot shrink (JVM+executor startup inside the timed
phase, fixed per-stage scheduling latency, the constant number of
barrier stages) and r is the steady-state per-turn rate. A tiny corpus
(W≈0) measures F directly; compute-only efficiency compares the
F-corrected rates:

    eff_compute = ((T_small(W) - F_small) / (T_big(W) - F_big)) / factor

Reads the JSON lines produced by scaling_localcluster.py (one per
invocation, different --turns) from BENCH/scaling_localcluster.jsonl
and prints the decomposition for every (tiny, big-corpus) combination.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(HERE, "BENCH", "scaling_localcluster.jsonl")


def main() -> None:
    runs = [json.loads(l) for l in open(PATH) if l.strip()]
    runs = [r for r in runs if r.get("pair", "").startswith("local-cluster[1,4")]
    by_turns: dict[int, dict] = {}
    for r in runs:
        # keep the least-noisy run per size (fastest big-level build)
        cur = by_turns.get(r["turns"])
        if cur is None or (
            r["big"]["phase_min"]["build_segments"]
            < cur["big"]["phase_min"]["build_segments"]
        ):
            by_turns[r["turns"]] = r
    sizes = sorted(by_turns)
    if len(sizes) < 2:
        sys.exit("need at least two corpus sizes")
    tiny = by_turns[sizes[0]]
    f_small = tiny["small"]["phase_min"]["build_segments"]
    f_big = tiny["big"]["phase_min"]["build_segments"]
    print(
        f"fixed overhead (build phase @ {sizes[0]} turns): "
        f"small={f_small:.1f}s big={f_big:.1f}s"
    )
    for w in sizes[1:]:
        r = by_turns[w]
        t_s = r["small"]["phase_min"]["build_segments"]
        t_b = r["big"]["phase_min"]["build_segments"]
        factor = r["factor"]
        raw = (w / t_b) / (w / t_s) / factor
        comp = ((t_s - f_small) / (t_b - f_big)) / factor if t_b > f_big else 0.0
        print(
            json.dumps(
                {
                    "turns": w,
                    "t_small_sec": round(t_s, 1),
                    "t_big_sec": round(t_b, 1),
                    "raw_efficiency": round(raw, 3),
                    "fixed_small_sec": round(f_small, 1),
                    "fixed_big_sec": round(f_big, 1),
                    "compute_only_efficiency": round(comp, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
