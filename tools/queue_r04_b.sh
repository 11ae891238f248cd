#!/bin/bash
# Round-4 queue b (runs after queue_r04_a.sh): adversarial-layout timing
# rows for the threshold-gated top-k merge (VERDICT r3 item 5's last
# sub-item — quantify the documented worst case on chip), fp32 + int8,
# 1M x 768 keys, 1024 queries, k=5.
cd /root/repo
if [ -f /tmp/queue_a.pid ]; then
  while kill -0 "$(cat /tmp/queue_a.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 60); do
  if timeout 180 python -c "import jax; d=jax.devices()[0]; print(d)" 2>/dev/null | grep -qi tpu; then
    echo "tunnel up after probe $i"; break
  fi
  echo "probe $i: unavailable; sleep 60"; sleep 60
done
OUT=BENCH_TOPK_layout_r04.jsonl
run_to() {
  local tmo=$1; shift
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$OUT"
  ERR=/tmp/qb_err_$RANDOM.log
  timeout "$tmo" "$@" 2>"$ERR" | tail -1 >> "$OUT"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"tail\": \"$(tail -4 "$ERR" | tr '\n' ' ' | tr '"' "'" )\"}" >> "$OUT"
  fi
}
run_to 1800 python tools/bench_retrieval.py --keys 1000000 --prepared --layout random
run_to 1800 python tools/bench_retrieval.py --keys 1000000 --prepared --layout ascending
run_to 1800 python tools/bench_retrieval.py --keys 1000000 --prepared --layout descending
run_to 1800 python tools/bench_retrieval.py --keys 1000000 --prepared --precision int8 --layout random
run_to 1800 python tools/bench_retrieval.py --keys 1000000 --prepared --precision int8 --layout ascending
echo '{"queue_r04_b_done": true}' >> $OUT
