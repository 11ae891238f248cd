#!/bin/bash
# Round-3 queue aa (after queue_r03_z.sh): on-chip A/B of the
# threshold-gated top-k merge (ops/topk_pallas.py). Pre-gating baselines:
# int8 1M prepared 0.553 s, int8 5M prepared 1.69 s (marginal ~0.28 s per
# 1M keys = merge-dominated at the oversampled k=21). queue-z's 1M rows
# already run the new kernel; this re-runs the 5M point.
cd /root/repo
if [ -f /tmp/queue_z.pid ]; then
  while kill -0 "$(cat /tmp/queue_z.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 200); do
  if timeout 180 python -c "import jax; d=jax.devices()[0]; print(d)" 2>/dev/null | grep -qi tpu; then
    echo "tunnel back after probe $i"; break
  fi
  echo "probe $i: unavailable; sleep 60"; sleep 60
done
TOUT=BENCH_TRAIN_sweep_r03.jsonl
run_to() {
  local tmo=$1; shift
  echo "{\"run\": \"$* [gated-merge]\", \"t\": $(date +%s)}" >> "$TOUT"
  ERR=/tmp/qaa_err_$RANDOM.log
  timeout "$tmo" "$@" 2>"$ERR" | tail -1 >> "$TOUT"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"tail\": \"$(tail -4 "$ERR" | tr '\n' ' ' | tr '"' "'" )\"}" >> "$TOUT"
  fi
}
run_to 9000 python tools/bench_retrieval.py --keys 5000000 --precision int8 --prepared
echo '{"queue_aa_done": true}' >> $TOUT
