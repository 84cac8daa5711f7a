"""Measured memory-bandwidth ceiling of this box at two thread counts.

A bandwidth-bound job's best-possible N->4N thread-scaling efficiency is
(B_hi / B_lo) / 4, where B_c is the aggregate copy bandwidth achievable
with c concurrent threads. numpy's copyto on 256 MB float64 buffers is a
pure streaming read+write (no Python-loop overhead, GIL released inside
BLAS-free memcpy), so per-thread buffers measure the shared bus, not numpy.

Usage: python scripts/membw_probe.py [lo] [hi] [reps]
Prints one JSON line: {"threads": {c: GB/s}, "ratio": r, "max_eff": e}
"""
import json
import sys
import threading
import time

import numpy as np

BUF_MB = 256
PASSES = 8


def worker(src, dst, start_evt, out, idx):
    start_evt.wait()
    t0 = time.perf_counter()
    for _ in range(PASSES):
        np.copyto(dst, src)
    out[idx] = time.perf_counter() - t0


def bw_at(threads: int) -> float:
    n = BUF_MB * 1024 * 1024 // 8
    bufs = [(np.ones(n), np.empty(n)) for _ in range(threads)]
    start = threading.Event()
    out = [0.0] * threads
    ts = [threading.Thread(target=worker, args=(s, d, start, out, i))
          for i, (s, d) in enumerate(bufs)]
    for t in ts:
        t.start()
    time.sleep(0.2)
    t0 = time.perf_counter()
    start.set()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    # read + write traffic per pass per thread
    gb = threads * PASSES * 2 * BUF_MB / 1024
    return gb / wall


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    res = {}
    for c in (1, lo, hi):
        res[c] = round(max(bw_at(c) for _ in range(reps)), 1)
    ratio = res[hi] / res[lo]
    print(json.dumps({
        "buf_mb": BUF_MB,
        "gbps": {str(k): v for k, v in res.items()},
        "hi_over_lo": round(ratio, 3),
        "max_bandwidth_bound_eff": round(ratio / (hi / lo), 3),
    }))


if __name__ == "__main__":
    main()
