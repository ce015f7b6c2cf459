#!/bin/bash
# Round-4 scaling campaign: interleaved local pairs (bench_scaling) and
# multi-JVM cluster pairs (bench_cluster, tuned defaults: DISK_ONLY
# pages cache + 500ms locality wait + 32 partitions — the A/B that
# selected them is §3 of the round-4 BASELINE.md section) on the m60
# crawl workload. One JSON line per run → BENCH/campaign_r4.jsonl.
# membw probes use 15s windows: this host shows bursty hypervisor
# steal that makes 4s windows unusable (measured, §4).
set -e
cd /root/repo
OUT=BENCH/campaign_r4.jsonl
SF=/root/testdata/sf0.01
REPS=${1:-3}

echo "== membw probe (campaign-window bus ceiling, 15s windows) =="
python tools/membw.py 128 15 2>/dev/null | sed 's/^{/{"probe": "membw-pre", /' >> "$OUT" || true

echo "== local pairs (local[2] vs local[8], m60) =="
for rep in $(seq 1 "$REPS"); do
  for cpus in 2 8; do
    echo "--- local rep $rep cpus $cpus"
    timeout 900 python tools/bench_scaling.py "$cpus" "$SF" 60 2>/dev/null \
      | tail -1 | sed "s/^{/{\"rep\": $rep, /" >> "$OUT"
  done
done

echo "== cluster pairs (1x2-core vs 4x2-core executor JVMs, m60) =="
bash tools/cluster.sh stop || true
bash tools/cluster.sh start 4 2 12g
trap 'bash tools/cluster.sh stop' EXIT
for rep in $(seq 1 "$REPS"); do
  for cores in 2 8; do
    echo "--- cluster rep $rep cores.max $cores"
    timeout 900 python tools/bench_cluster.py "$cores" "$SF" 60 2>/dev/null \
      | tail -1 | sed "s/^{/{\"rep\": $rep, \"tuned\": true, /" >> "$OUT"
  done
done
bash tools/cluster.sh stop || true
python tools/membw.py 128 15 2>/dev/null | sed 's/^{/{"probe": "membw-post", /' >> "$OUT" || true
echo "campaign done -> $OUT"
