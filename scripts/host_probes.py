#!/usr/bin/env python
"""Host capability probes backing the BENCH scaling analysis.

Two pure-python multiprocessing probes, no Spark:

- alu: cache-resident integer loop — isolates scheduler/steal effects.
- bw:  large-array numpy streaming (what the encode kernel actually
  does to memory) — isolates the memory-bandwidth ceiling.

Run each at 1/4/16/32 processes; the per-process yield curve at each
width is the host's concurrency behavior with ZERO dataflow involved.
A job whose machine-CPU-per-work inflation matches the bw probe's
yield drop is bandwidth-bound on this host, not misscheduled.
"""
import multiprocessing as mp
import sys
import time


def alu(q):
    t0 = time.monotonic(); n = 0; x = 0
    while time.monotonic() - t0 < 15:
        for _ in range(100000):
            x = (x * 1103515245 + 12345) % (1 << 31)
        n += 100000
    q.put(n)


def bw(q):
    import numpy as np
    a = np.random.randint(0, 1 << 30, 20_000_000, dtype=np.int64)  # 160MB
    b = np.zeros_like(a)
    t0 = time.monotonic(); n = 0
    while time.monotonic() - t0 < 12:
        np.add(a, 1, out=b)
        int(b[::4096].sum())  # ~320MB streamed per iter
        n += 1
    q.put(n)


def steal():
    with open("/proc/stat") as f:
        p = f.readline().split()
    return int(p[8]), sum(int(x) for x in p[1:])


def main():
    fn = {"alu": alu, "bw": bw}[sys.argv[1] if len(sys.argv) > 1 else "bw"]
    for nproc in (1, 4, 16, 32):
        s0, t0 = steal()
        q = mp.Queue()
        ps = [mp.Process(target=fn, args=(q,)) for _ in range(nproc)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        s1, t1 = steal()
        total = sum(q.get() for _ in ps)
        print(
            f"procs={nproc:2d} aggregate={total} per_proc={total / nproc:.1f} "
            f"steal_pct={100 * (s1 - s0) / max(1, t1 - t0):.1f}"
        )


if __name__ == "__main__":
    main()
