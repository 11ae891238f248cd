#!/bin/bash
# Round-3 queue v (after queue_r03_u.sh): crown the smaller-batch champion.
#  1) B=48 K=512 + frozen-bf16, best-of-4  -> record attempt (1.92 ms/sample
#     measured without frozen-bf16 = 522.1 samples/s)
#  2) B=32 K=768 + frozen-bf16, best-of-4  -> record attempt if the B=32
#     ladder point beat B=48
#  3) B=24 K=1024 probe -> does the per-sample improvement keep going?
#  4) self-time per-op trace at B=48 (fixed aggregation) -> truthful
#     breakdown for the next optimization target
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
  local out=$1; shift
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$out"
  ERR=/tmp/qv_err_$RANDOM.log
  timeout 3600 "$@" 2>"$ERR" | tail -1 >> "$out"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"tail\": \"$(tail -4 "$ERR" | tr '\n' ' ' | tr '"' "'" )\"}" >> "$out"
  fi
}
run_to $TOUT python bench.py --train --host-crop --batch 48 --scan 512 --remat-policy dots --rbg --same-batch --frozen-bf16 --dispatches 4
run_to $TOUT python bench.py --train --host-crop --batch 32 --scan 768 --remat-policy dots --rbg --same-batch --frozen-bf16 --dispatches 4
run_to $TOUT python bench.py --train --host-crop --batch 24 --scan 1024 --remat-policy dots --rbg --same-batch --dispatches 2
run_to $TOUT python tools/trace_train_step.py --batch 48 --scan 48 --remat-policy dots --host-crop --rbg
# LN probe rerun with the elementwise-bandwidth floor reference (decides
# whether a Pallas LN kernel has headroom) + repeat fwd point (first run's
# fwd number looked dispatch-noise-contaminated)
run_to $TOUT python tools/smoke_ln_bwd_tpu.py --tpu --batch 64 --n 197 --k 400
echo '{"queue_v_done": true}' >> $TOUT
