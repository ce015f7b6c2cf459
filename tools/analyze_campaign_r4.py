"""Summarize BENCH/campaign_r4.jsonl: per-arm medians, pairwise and
median-of-arms 2->8 scaling efficiency for the local and cluster modes,
plus the membw bus ceiling from the same window.

Usage: python tools/analyze_campaign_r4.py [path]
"""

from __future__ import annotations

import json
import statistics
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/campaign_r4.jsonl"
    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    print("skip unparseable:", line[:80], file=sys.stderr)

    membw = {}
    for r in rows:
        if "copy_sum_gb_per_s" in r:
            membw.setdefault(r.get("probe", "membw"), {})[r["procs"]] = (
                r["copy_sum_gb_per_s"])
    for probe, curve in membw.items():
        print(f"{probe}: {curve}")
        if 2 in curve and 8 in curve and curve[2]:
            s = curve[8] / curve[2]
            print(f"  2->8 bus scaling x{s:.2f} (eff {s / 4:.2f})")

    for mode, lo_key, hi_key in (("local", 2, 8), ("cluster", 2, 8)):
        arms = {lo_key: [], hi_key: []}
        for r in rows:
            if "urls_per_s" not in r:
                continue
            is_cluster = "cores_max" in r
            if (mode == "cluster") != is_cluster:
                continue
            k = r.get("cores_max", r.get("cpus"))
            if k in arms:
                arms[k].append(r)
        if not arms[lo_key] or not arms[hi_key]:
            print(f"{mode}: incomplete ({len(arms[lo_key])} lo, "
                  f"{len(arms[hi_key])} hi)")
            continue
        lo = [r["urls_per_s"] for r in arms[lo_key]]
        hi = [r["urls_per_s"] for r in arms[hi_key]]
        print(f"{mode}: {lo_key}-core arm n={len(lo)} "
              f"median {statistics.median(lo):.0f} urls/s {sorted(lo)}")
        print(f"{mode}: {hi_key}-core arm n={len(hi)} "
              f"median {statistics.median(hi):.0f} urls/s {sorted(hi)}")
        med_eff = (statistics.median(hi) / statistics.median(lo)) / 4
        pair_effs = []
        for a, b in zip(arms[lo_key], arms[hi_key]):
            if a.get("rep") == b.get("rep"):
                pair_effs.append((b["urls_per_s"] / a["urls_per_s"]) / 4)
        print(f"{mode}: eff medians-of-arms {med_eff:.3f}; "
              f"pairwise {[round(e, 3) for e in pair_effs]} "
              f"(median {statistics.median(pair_effs):.3f})"
              if pair_effs else f"{mode}: eff medians-of-arms {med_eff:.3f}")
        walls = {k: [r["wall_s"] for r in v] for k, v in arms.items()}
        print(f"{mode}: walls lo {sorted(walls[lo_key])} "
              f"hi {sorted(walls[hi_key])}")


if __name__ == "__main__":
    main()
