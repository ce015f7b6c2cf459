#!/bin/bash
# Round-5 measurement campaign:
#  (a) amortization rerun post split-history states (VERDICT r4 next #1
#      Done criterion): payload-light crawl at mirrors=60 vs 240,
#      local[8], interleaved — is the final (~24k-URL) round's wall
#      still growing with |state|?
#  (b) seen-check shuffle BYTES A/B on the multi-JVM standalone cluster
#      (VERDICT r4 next #3): broadcast-suspect vs default anti-join.
#  (c) fresh cluster N-vs-4N crawl pairs post-split (m60, interleaved).
# One JSON line per run → BENCH/campaign_r5.jsonl, membw-bracketed
# (15s windows — this host's hypervisor steal makes shorter windows
# unusable, BENCH/BASELINE.md §4).
set -e
cd /root/repo
OUT=BENCH/campaign_r5.jsonl
SF=/root/testdata/sf0.01
REPS=${1:-2}

probe() {
  python tools/membw.py 128 15 2>/dev/null \
    | sed "s/^{/{\"probe\": \"membw-$1\", /" >> "$OUT" || true
}

echo "== membw pre ==" ; probe pre

echo "== (a) amortization: m60 vs m240, local[8], payload-light =="
for rep in $(seq 1 "$REPS"); do
  for m in 60 240; do
    echo "--- amortize rep $rep mirrors $m"
    echo "{\"arm\":\"amortize\",\"rep\":$rep,\"mirrors\":$m}" >> "$OUT"
    timeout 900 env BENCH_VALIDATE_PAYLOAD=0 \
      python tools/bench_scaling.py 8 "$SF" "$m" 2>/dev/null \
      | tail -1 >> "$OUT"
  done
done

probe mid

echo "== cluster up =="
bash tools/cluster.sh stop || true
bash tools/cluster.sh start 4 2 12g
trap 'bash tools/cluster.sh stop' EXIT

echo "== (b) seen-check shuffle-bytes A/B (multi-JVM) =="
echo '{"arm":"seen_shuffle_ab"}' >> "$OUT"
timeout 1200 python tools/seen_shuffle_ab.py 4 200000 3 2>/dev/null \
  >> "$OUT" || echo '{"arm":"seen_shuffle_ab","error":true}' >> "$OUT"

echo "== (c) cluster crawl pairs (1 vs 4 executor JVMs, m60) =="
for rep in $(seq 1 "$REPS"); do
  for cores in 2 8; do
    echo "--- cluster rep $rep cores.max $cores"
    echo "{\"arm\":\"cluster\",\"rep\":$rep,\"cores\":$cores}" >> "$OUT"
    timeout 900 python tools/bench_cluster.py "$cores" "$SF" 60 2>/dev/null \
      | tail -1 >> "$OUT"
  done
done

bash tools/cluster.sh stop || true
trap - EXIT
probe post
echo "campaign done -> $OUT"
