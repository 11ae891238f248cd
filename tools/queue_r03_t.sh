#!/bin/bash
# Round-3 queue t (replaces queue_r03_s.sh; post best-of-N-dispatch bench):
# probe the tunnel back, then sequentially (ONE TPU process at a time):
#  1) extraction bench, new default (merged LoRA)   -> headline check
#  2) extraction --no-merge-lora                     -> merged-LoRA A/B
#  3) train champion, best-of-3 dispatches           -> record attempt
#  4) per-op trace of the train step (B=64 dots)     -> optimization targets
#  5) train A/B at B=64 K=64: dots vs dots_act
#  6) extraction batch ladder 384 / 512
# Results appended to the jsonl logs; errors recorded with stderr tails.
cd /root/repo
for i in $(seq 1 200); do
  if timeout 180 python -c "import jax; d=jax.devices()[0]; print(d)" 2>/dev/null | grep -qi tpu; then
    echo "tunnel back after probe $i"; break
  fi
  echo "probe $i: unavailable; sleep 60"; sleep 60
done
EOUT=BENCH_EXTRACT_sweep_r03.jsonl
TOUT=BENCH_TRAIN_sweep_r03.jsonl
run_to() {
  local out=$1; shift
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$out"
  ERR=/tmp/qt_err_$RANDOM.log
  timeout 3600 "$@" 2>"$ERR" | tail -1 >> "$out"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"tail\": \"$(tail -4 "$ERR" | tr '\n' ' ' | tr '"' "'" )\"}" >> "$out"
  fi
}
run_to $EOUT python bench.py
run_to $EOUT python bench.py --no-merge-lora
run_to $TOUT python bench.py --champion
run_to $TOUT python tools/trace_train_step.py --batch 64 --scan 64 --remat-policy dots --host-crop --rbg
run_to $TOUT python bench.py --train --host-crop --batch 64 --scan 64 --remat-policy dots --rbg --same-batch --dispatches 2
run_to $TOUT python bench.py --train --host-crop --batch 64 --scan 64 --remat-policy dots_act --rbg --same-batch --dispatches 2
run_to $EOUT python bench.py --batch 384
run_to $EOUT python bench.py --batch 512
echo '{"queue_t_done": true}' >> $TOUT
