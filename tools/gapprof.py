"""Driver-serial-time profile: from a Spark event log, compute the
fraction of wall time with zero running tasks (= driver planning /
py4j / commit gaps) and list the largest such gaps with the job that
follows each (what the driver was preparing).

Usage: python tools/gapprof.py <event-log-file> [top_n]
"""
import json, sys

def main():
    path = sys.argv[1]; top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    iv = []          # task (start, end)
    jobs = []        # (submit_ts, job_id, stage names)
    t_min = t_max = None
    with open(path) as f:
        for line in f:
            try: ev = json.loads(line)
            except json.JSONDecodeError: continue
            e = ev.get("Event")
            if e == "SparkListenerTaskStart":
                ti = ev["Task Info"]; iv.append([ti["Launch Time"], None])
            elif e == "SparkListenerTaskEnd":
                ti = ev["Task Info"]
                for x in reversed(iv):
                    if x[1] is None and x[0] == ti["Launch Time"]:
                        x[1] = ti["Finish Time"]; break
            elif e == "SparkListenerJobStart":
                names = [s["Stage Name"].split(" at ")[0]
                         for s in ev.get("Stage Infos", [])][:3]
                jobs.append((ev["Submission Time"], ev["Job ID"], names))
    iv = [x for x in iv if x[1] is not None]
    if not iv: print("{}"); return
    t_min = min(x[0] for x in iv); t_max = max(x[1] for x in iv)
    iv.sort()
    merged = []
    for s, t in iv:
        if merged and s <= merged[-1][1]: merged[-1][1] = max(merged[-1][1], t)
        else: merged.append([s, t])
    busy = sum(t - s for s, t in merged)
    wall = t_max - t_min
    gaps = []
    prev = t_min
    for s, t in merged:
        if s > prev: gaps.append((prev, s))
        prev = max(prev, t)
    gaps.sort(key=lambda g: g[1]-g[0], reverse=True)
    print(json.dumps({"wall_s": round(wall/1000,1), "busy_s": round(busy/1000,1),
                      "idle_s": round((wall-busy)/1000,1),
                      "idle_pct": round(100*(wall-busy)/wall,1),
                      "n_jobs": len(jobs)}))
    for g0, g1 in gaps[:top_n]:
        nxt = [j for j in jobs if j[0] >= g0 - 50]
        nxt = nxt[0] if nxt else None
        print(json.dumps({"gap_s": round((g1-g0)/1000,2),
                          "at_s": round((g0-t_min)/1000,1),
                          "next_job": nxt[1] if nxt else None,
                          "stages": nxt[2] if nxt else None}))

if __name__ == "__main__":
    main()
