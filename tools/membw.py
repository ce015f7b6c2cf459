"""Memory-bandwidth scaling probe for this box.

The two-parallelism-level scaling evidence (tools/bench_scaling.py) is
measured on a single machine where all N worker processes share ONE
memory bus. Payload-heavy stages (Arrow transfer + image decode +
pixel compare ≈ several bytes touched per payload byte) are therefore
bandwidth-bound: past the bus saturation point, extra cores add zero
throughput on THIS box, while on a real multi-executor cluster each
executor brings its own memory bus and the same code keeps scaling.

This probe quantifies the knee: aggregate bytes/s of an out-of-cache
numpy copy+sum loop at 1/2/4/8/16/32 processes. Output: one JSON line
per level. Used by BENCH/BASELINE.md to justify reporting the N-vs-4N
pair measured below the knee.

Usage: python tools/membw.py [mb_per_proc] [seconds]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _worker(mb: int, seconds: float, start_evt, out):
    import numpy as np

    a = np.zeros(mb * 1_000_000, dtype=np.uint8)  # touch: setup untimed
    a[::4096] = 1
    b = np.empty_like(a)
    start_evt.wait()  # barrier: all workers allocated before timing
    t0 = time.perf_counter()
    t_end = t0 + seconds
    n_bytes = 0
    sink = 0
    while time.perf_counter() < t_end:
        np.copyto(b, a)            # read + write
        sink += int(b[::65536].sum())
        n_bytes += 2 * a.nbytes
    out.put((n_bytes, time.perf_counter() - t0, sink))


def measure(procs: int, mb: int, seconds: float) -> float:
    q = mp.Queue()
    evt = mp.Event()
    ps = [mp.Process(target=_worker, args=(mb, seconds, evt, q))
          for _ in range(procs)]
    for p in ps:
        p.start()
    time.sleep(1.0 + mb / 500)  # let every worker finish its allocation
    evt.set()
    rates = []
    for _ in ps:
        n_bytes, elapsed, _ = q.get()
        rates.append(n_bytes / elapsed)
    for p in ps:
        p.join()
    return sum(rates)


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    for procs in (1, 2, 4, 8, 16, 32):
        gbps = measure(procs, mb, seconds) / 1e9
        print(json.dumps({"procs": procs, "copy_sum_gb_per_s": round(gbps, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
