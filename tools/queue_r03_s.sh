#!/bin/bash
# Round-3 queue s (post merge-LoRA/dots_act/attn-bwd-dtype commit dc884e9):
# probe the tunnel back, then sequentially:
#  1) extraction bench (new default: merged LoRA, CLS-before-LN, crop-first)
#  2) extraction batch ladder 384 / 512
#  3) train quick A/B at B=64 K=64: dots vs dots_act (new attn bwd in both)
# One TPU process at a time; every result appended to the jsonl logs.
cd /root/repo
for i in $(seq 1 60); do
  if timeout 600 python -c "import jax; d=jax.devices()[0]; print(d)" 2>/dev/null | grep -qi tpu; then
    echo "tunnel back after probe $i"; break
  fi
  echo "probe $i: unavailable; sleep 60"; sleep 60
done
EOUT=BENCH_EXTRACT_sweep_r03.jsonl
TOUT=BENCH_TRAIN_sweep_r03.jsonl
run_to() {
  local out=$1; shift
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$out"
  ERR=/tmp/qs_err_$RANDOM.log
  timeout 3600 "$@" 2>"$ERR" | tail -1 >> "$out"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"tail\": \"$(tail -4 "$ERR" | tr '\n' ' ' | tr '"' "'" )\"}" >> "$out"
  fi
}
run_to $EOUT python bench.py
run_to $EOUT python bench.py --batch 384
run_to $EOUT python bench.py --batch 512
run_to $EOUT python bench.py --no-merge-lora
run_to $TOUT python bench.py --train --host-crop --batch 64 --scan 64 --remat-policy dots --rbg --same-batch
run_to $TOUT python bench.py --train --host-crop --batch 64 --scan 64 --remat-policy dots_act --rbg --same-batch
echo '{"queue_s_done": true}' >> $TOUT
