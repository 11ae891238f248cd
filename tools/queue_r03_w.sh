#!/bin/bash
# Round-3 queue w (after queue_r03_v.sh):
#  1) flagship batch-400 GradCache recipe, measured: global batch 400 as
#     8 x 50 microbatches with FULL-batch InfoNCE (the reference's
#     batch-400 ClipLoss semantics on ONE 16 GB chip), K macro-steps per
#     dispatch via the new same_batch gradcache scan. Small-K probe first
#     (macro-step cost unknown), then a sized-up run.
#  2) int8 retrieval retries: the queue-u runs timed out at 3600 s BEFORE
#     the --prepared slab-warm skip + persistent compile cache landed
#     (commit b63a8e7); retry with bigger timeouts.
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
  ERR=/tmp/qw_err_$RANDOM.log
  timeout "$tmo" "$@" 2>"$ERR" | tail -1 >> "$TOUT"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"tail\": \"$(tail -4 "$ERR" | tr '\n' ' ' | tr '"' "'" )\"}" >> "$TOUT"
  fi
}
run_to 5400 python bench.py --train --batch 24 --scan 1024 --remat-policy dots --rbg --same-batch --host-crop --frozen-bf16 --dispatches 4
run_to 5400 python bench.py --train --batch 400 --gradcache 8 --scan 4 --remat-policy dots --rbg --same-batch --host-crop --dispatches 2
run_to 5400 python bench.py --train --batch 400 --gradcache 8 --scan 16 --remat-policy dots --rbg --same-batch --host-crop --dispatches 3
run_to 5400 python tools/bench_retrieval.py --keys 1000000 --precision int8 --prepared
run_to 7200 python tools/bench_retrieval.py --keys 5000000 --precision int8 --prepared
echo '{"queue_w_done": true}' >> $TOUT
