"""Host-health gate for scaling-bench runs (bench.py's membw probe, standalone).

The sandbox's shared host intermittently degrades its 32-thread memory
bandwidth below the 8-thread figure (observed r4 and twice in r5); any
scaling row captured in such a window measures the hypervisor, not the
engine. This probe replicates bench.py's membw_job exactly (256 MiB
copyto per thread, 8 passes, best-of-3) and exits 0 only when the box
looks healthy enough for a run of record:

  * 32-thread bandwidth >= 8-thread bandwidth (the degraded signature is
    a 32t figure BELOW 8t), and
  * 32-thread bandwidth >= MIN_GBPS (default 100; healthy r4 window
    measured 109.2).

Usage: python scripts/host_health.py [--min-gbps 100]  -> prints one JSON
line, exit 0 healthy / 1 degraded.
"""

from __future__ import annotations

import json
import sys
import threading
import time


def bw_at(threads: int, buf_mb: int = 256, passes: int = 8) -> float:
    import numpy as np

    n = buf_mb * 1024 * 1024 // 8
    bufs = [(np.ones(n), np.empty(n)) for _ in range(threads)]
    start = threading.Event()
    out = [0.0] * threads

    def worker(src, dst, i):
        start.wait()
        for _ in range(passes):
            np.copyto(dst, src)
        out[i] = 1.0

    ts = [
        threading.Thread(target=worker, args=(s, d, i))
        for i, (s, d) in enumerate(bufs)
    ]
    for t in ts:
        t.start()
    time.sleep(0.2)
    t0 = time.perf_counter()
    start.set()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    return threads * passes * 2 * buf_mb / 1024 / wall


def main() -> int:
    min_gbps = 100.0
    if "--min-gbps" in sys.argv:
        min_gbps = float(sys.argv[sys.argv.index("--min-gbps") + 1])
    res = {c: round(max(bw_at(c) for _ in range(3)), 1) for c in (1, 8, 32)}
    healthy = res[32] >= res[8] and res[32] >= min_gbps
    print(json.dumps({"gbps": res, "healthy": healthy, "min_gbps": min_gbps}))
    return 0 if healthy else 1


if __name__ == "__main__":
    sys.exit(main())
