"""Workload-matched parallel-scaling ceiling for THIS machine.

The N-vs-4N criterion is measured on one box where all workers share
one memory system (and SMT pairs). A pure-ALU probe overstates what
any memory-touching workload can scale to; this probe runs the actual
per-row validation kernel (decode + PSNR + phash compare — the crawl
hot path's Python side) in N independent processes and reports
aggregate rows/s. The job's measured scaling divided by THIS ceiling
is the share of the efficiency loss attributable to the job itself
rather than the shared-memory host; on a real cluster each executor
adds its own memory system, so the ceiling there tracks executor
count, not socket count.

Usage: python tools/udfprobe.py [rows_per_batch] [seconds]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(n_rows: int, seconds: float, start_evt, q):
    os.environ["OMP_NUM_THREADS"] = "1"
    os.environ["OPENBLAS_NUM_THREADS"] = "1"
    from infinitycrawler_spark.functions.images import (
        make_payload,
        validate_payload,
    )

    rows = [(make_payload(f"img-{i}", "h.shop", f"/p/{i}", 32, 24, "rgb8-q"),
             f"/p/{i}") for i in range(n_rows)]
    start_evt.wait()
    t0 = time.perf_counter()
    t_end = t0 + seconds
    n = 0
    while time.perf_counter() < t_end:
        for r, path in rows:
            ok, _, pm, co = validate_payload(
                r["image_id"], r["bytes"], 32, 24, "rgb8-q",
                r["caption"], r["phash"], "h.shop", path)
            assert ok and pm and co
        n += n_rows
    q.put(n / (time.perf_counter() - t0))


def measure(procs: int, n_rows: int, seconds: float) -> float:
    q = mp.Queue()
    evt = mp.Event()
    ps = [mp.Process(target=_worker, args=(n_rows, seconds, evt, q))
          for _ in range(procs)]
    for p in ps:
        p.start()
    time.sleep(2.0)
    evt.set()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates)


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    for procs in (1, 4, 8, 16, 32):
        rate = measure(procs, n_rows, seconds)
        print(json.dumps({"probe": "udf", "procs": procs,
                          "rows_per_s": round(rate)}), flush=True)


if __name__ == "__main__":
    main()
