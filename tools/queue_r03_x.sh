#!/bin/bash
# Round-3 queue x (after queue_r03_w.sh, which died mid-run):
#  1) champion repro with the NEW bench.py default (B=24 K=1024
#     frozen-bf16) — verifies the updated --champion path on the chip.
#  2) extend the small-batch ladder: B=20 K=1280, B=16 K=1536 (per-sample
#     cost kept falling 2.00 -> 1.65 ms/sample from B=64 down to B=24).
#  3) retry the 5M-key int8 resident retrieval (queue-w was killed before
#     it finished; 1M measured 0.553 s / 1852 q/s).
# ONE TPU process at a time; results append to the jsonl log.
cd /root/repo
for i in $(seq 1 200); do
  if timeout 180 python -c "import jax; d=jax.devices()[0]; print(d)" 2>/dev/null | grep -qi tpu; then
    echo "tunnel back after probe $i"; break
  fi
  echo "probe $i: unavailable; sleep 60"; sleep 60
done
TOUT=BENCH_TRAIN_sweep_r03.jsonl
run_to() {
  local tmo=$1; shift
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$TOUT"
  ERR=/tmp/qx_err_$RANDOM.log
  timeout "$tmo" "$@" 2>"$ERR" | tail -1 >> "$TOUT"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"tail\": \"$(tail -4 "$ERR" | tr '\n' ' ' | tr '"' "'" )\"}" >> "$TOUT"
  fi
}
run_to 3600 python bench.py --champion
run_to 5400 python bench.py --train --batch 20 --scan 1280 --remat-policy dots --rbg --same-batch --host-crop --frozen-bf16 --dispatches 3
run_to 5400 python bench.py --train --batch 16 --scan 1536 --remat-policy dots --rbg --same-batch --host-crop --frozen-bf16 --dispatches 3
run_to 9000 python tools/bench_retrieval.py --keys 5000000 --precision int8 --prepared
echo '{"queue_x_done": true}' >> $TOUT
