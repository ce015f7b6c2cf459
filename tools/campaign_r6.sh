#!/bin/bash
# Round-6 cluster campaign — VERDICT r5 "next #1": re-establish the
# N-vs-4N multi-JVM scaling evidence at round-4 discipline on the
# FINAL shipped code (now incl. adaptive per-round partitioning and
# pipelined handle prep): >=3 interleaved 1-exec vs 4-exec pairs,
# membw-bracketed, medians-of-arms. One JSON line per run ->
# BENCH/campaign_r6.jsonl.
set -e
cd /root/repo
OUT=BENCH/campaign_r6.jsonl
SF=/root/testdata/sf0.01
REPS=${1:-3}

probe() {
  python tools/membw.py 128 15 2>/dev/null \
    | sed "s/^{/{\"probe\": \"membw-$1\", /" >> "$OUT" || true
}

probe pre
bash tools/cluster.sh stop || true
bash tools/cluster.sh start 4 2 12g
trap 'bash tools/cluster.sh stop' EXIT

for rep in $(seq 1 "$REPS"); do
  for cores in 2 8; do
    echo "--- cluster rep $rep cores.max $cores"
    echo "{\"arm\":\"cluster\",\"rep\":$rep,\"cores\":$cores}" >> "$OUT"
    timeout 900 python tools/bench_cluster.py "$cores" "$SF" 60 2>/dev/null \
      | tail -1 >> "$OUT"
  done
  probe "mid$rep"
done

bash tools/cluster.sh stop || true
trap - EXIT
probe post
echo done
