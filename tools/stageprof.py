"""Per-stage profile from a Spark event log: wall time, summed task
time, and effective parallelism (task_s / wall_s) per stage — the
diagnostic for which stage caps the N-vs-4N scaling efficiency.

Usage: python tools/stageprof.py <event-log-file> [min_wall_s]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    min_wall = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    task_ms = defaultdict(float)      # stage id -> summed executorRunTime
    gc_ms = defaultdict(float)
    py_ms = defaultdict(float)        # python worker time (executor-side)
    ser_ms = defaultdict(float)
    stages = {}
    app_start = app_end = None
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif e == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                task_ms[sid] += m.get("Executor Run Time", 0)
                gc_ms[sid] += m.get("JVM GC Time", 0)
                ser_ms[sid] += (m.get("Executor Deserialize Time", 0)
                                + m.get("Result Serialization Time", 0))
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = si
    total_wall = (app_end - app_start) / 1000 if app_start and app_end else 0
    rows = []
    for sid, si in sorted(stages.items()):
        sub = si.get("Submission Time")
        comp = si.get("Completion Time")
        if sub is None or comp is None:
            continue
        wall = (comp - sub) / 1000
        rows.append({
            "stage": sid, "name": si["Stage Name"].split(" at ")[0][:40],
            "tasks": si["Number of Tasks"], "wall_s": round(wall, 2),
            "task_s": round(task_ms[sid] / 1000, 1),
            "par": round(task_ms[sid] / 1000 / wall, 1) if wall > 0.05 else None,
            "gc_s": round(gc_ms[sid] / 1000, 1),
        })
    shown = [r for r in rows if r["wall_s"] >= min_wall]
    covered = sum(r["wall_s"] for r in rows)
    print(json.dumps({"app_wall_s": round(total_wall, 1),
                      "sum_stage_wall_s": round(covered, 1),
                      "gap_s": round(total_wall - covered, 1)}))
    for r in shown:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
