#!/usr/bin/env python
"""How do the ACTUAL frontier kernels scale in a bare multiprocessing
pool (no Spark)? This measures the hardware ceiling for the workload
itself — clock throttling AND shared memory bandwidth — which a pure
busy-loop probe (registers only) cannot see.

Work per process is fixed, process count varies: perfect scaling =
equal wall. Prints speedup lo->hi and the implied efficiency ceiling.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# shared with bench.py so the standalone tool and the published
# BASELINE.md ceiling measure the SAME workload definition (two drifting
# copies previously used different canon paths and configs)
from bench import _kernel_chunk  # noqa: E402


def timed(procs: int, urls_per_proc: int, chunks_per_proc: int = 3) -> float:
    work = [
        (i * urls_per_proc // chunks_per_proc, urls_per_proc // chunks_per_proc)
        for i in range(procs * chunks_per_proc)
    ]
    with mp.Pool(procs) as pool:
        pool.map(_kernel_chunk, [(0, 1000)] * procs)  # warm imports
        t0 = time.monotonic()
        pool.map(_kernel_chunk, work)
        return time.monotonic() - t0


def main() -> None:
    lo, hi = int(sys.argv[1]), int(sys.argv[2])
    urls_per_proc = int(sys.argv[3]) if len(sys.argv) > 3 else 150_000
    # interleave lo/hi so host drift cancels
    lo_w, hi_w = [], []
    for _ in range(2):
        lo_w.append(timed(lo, urls_per_proc))
        hi_w.append(timed(hi, urls_per_proc))
    tl, th = min(lo_w), min(hi_w)
    speedup = (hi * urls_per_proc / th) / (lo * urls_per_proc / tl)
    print(json.dumps({
        "lo": lo, "hi": hi, "lo_walls": [round(x, 2) for x in lo_w],
        "hi_walls": [round(x, 2) for x in hi_w],
        "speedup": round(speedup, 2),
        "ceiling_eff": round(speedup / (hi / lo), 3),
    }))


if __name__ == "__main__":
    main()
