#!/bin/bash
# Round-3 queue y (runs after queue_r03_x.sh exits):
# Batch-400 GradCache ladder with frozen-bf16 (the queue-w runs at 393-396
# samples/s had frozen_bf16 OFF) and smaller microbatches — the plain-step
# ladder showed per-sample cost falls superlinearly with batch (B=50 ~1.9,
# B=25 ~1.65 ms/sample), so 16x25 should beat 8x50 despite more passes.
# Goal: full batch-400 InfoNCE semantics above the 450/s target on ONE chip.
cd /root/repo
# wait for queue-x (one TPU process at a time)
if [ -f /tmp/queue_x.pid ]; then
  while kill -0 "$(cat /tmp/queue_x.pid)" 2>/dev/null; do sleep 60; done
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
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$TOUT"
  ERR=/tmp/qy_err_$RANDOM.log
  timeout "$tmo" "$@" 2>"$ERR" | tail -1 >> "$TOUT"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"tail\": \"$(tail -4 "$ERR" | tr '\n' ' ' | tr '"' "'" )\"}" >> "$TOUT"
  fi
}
run_to 5400 python bench.py --train --batch 400 --gradcache 8 --scan 16 --remat-policy dots --rbg --same-batch --host-crop --frozen-bf16 --dispatches 3
run_to 7200 python bench.py --train --batch 400 --gradcache 16 --scan 16 --remat-policy dots --rbg --same-batch --host-crop --frozen-bf16 --dispatches 3
run_to 7200 python bench.py --train --batch 400 --gradcache 20 --scan 16 --remat-policy dots --rbg --same-batch --host-crop --frozen-bf16 --dispatches 3
echo '{"queue_y_done": true}' >> $TOUT
