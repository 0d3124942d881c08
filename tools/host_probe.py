"""5-second host-state probe (BASELINE.md §8: this VM's first-touch fault
path degrades under sustained load and recovers unpredictably; high-
concurrency throughput swings ~2× on identical code). Measures:

- ``alloc1``: single-process fresh-alloc+memset of 512 MB (seconds) —
  the fault-path cost with no concurrency;
- ``allocN``: N concurrent processes doing 256 MB each (max seconds) —
  the concurrent fault-path cost the analyzer/encode pools actually pay.

Healthy window ≈ alloc1 ≤ 0.25 s and allocN ≤ 1.2×·alloc-scaled; degraded
windows show allocN inflating 3-10×. Run before any ladder whose numbers
will be recorded. Usage: ``python tools/host_probe.py [nprocs]``.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn(size_mb: int, q) -> None:
    t0 = time.perf_counter()
    b = bytearray(size_mb << 20)  # fresh pages: first-touch on memset
    b[:] = b"\x5a" * len(b)
    q.put(time.perf_counter() - t0)


def probe(nprocs: int = 16) -> dict:
    q = mp.Queue()
    t0 = time.perf_counter()
    _burn(512, q)
    alloc1 = q.get()
    procs = [mp.Process(target=_burn, args=(256, q)) for _ in range(nprocs)]
    t1 = time.perf_counter()
    for p in procs:
        p.start()
    times = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall_n = time.perf_counter() - t1
    return {
        "alloc1_s": round(alloc1, 3),
        f"alloc{nprocs}_max_s": round(max(times), 3),
        f"alloc{nprocs}_wall_s": round(wall_n, 3),
        "nprocs": nprocs,
        "total_s": round(time.perf_counter() - t0, 3),
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(json.dumps(probe(n)))
