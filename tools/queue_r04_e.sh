#!/bin/bash
# Round-4 queue e — serialized on the one tunneled chip:
#   1-2. batch-400 GradCache with FULLY-CHUNKED stage 1 (--s1-chunk:
#        row-keyed dropout lets the BERT towers embed at extraction batch
#        geometry; commit 1442a5c) — the lever aimed at closing the
#        0.985x -> >=1.0x gap on the 450/s target
#   3.   dots_act retry (timed out under host contention in queue d)
#   4-6. e2e reruns on the fixed pipeline: loader ceiling with the
#        native-decode host crop, bounded train epoch (train_crop), and
#        extraction with the sliding-window fetch (commit c5e6d04)
cd /root/repo
if [ -f /tmp/queue_d.pid ]; then
  while kill -0 "$(cat /tmp/queue_d.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 60); do
  if timeout 180 python -c "import jax; d=jax.devices()[0]; print(d)" 2>/dev/null | grep -qi tpu; then
    echo "tunnel up after probe $i"; break
  fi
  echo "probe $i: unavailable; sleep 60"; sleep 60
done
E2E=BENCH_E2E_r04.jsonl
TR=BENCH_TRAIN_sweep_r04.jsonl
N=0
run_to() {
  local tmo=$1 out=$2; shift 2
  N=$((N+1))
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$out"
  ERR=/tmp/qe_err_${N}.log
  timeout "$tmo" "$@" 2>"$ERR" | tail -1 >> "$out"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"stderr\": \"/tmp/qe_err_${N}.log\", \"tail\": \"$(tail -2 "$ERR" | tr '\n' ' ' | tr '"' "'" | head -c 400)\"}" >> "$out"
  fi
}
GC="python bench.py --train --batch 400 --scan 16 --rbg --same-batch --host-crop --frozen-bf16 --dispatches 3 --gradcache 20"
run_to 3000 $TR $GC --remat-policy dots --s1-chunk 100
run_to 3000 $TR $GC --remat-policy dots --s1-chunk 200
run_to 3000 $TR $GC --remat-policy dots_act --s1-image-batch 100
run_to 1800 $E2E python tools/e2e_pipeline_bench.py --loader-only --train-crop --steps 40 --batch 200 --out $E2E
run_to 3600 $E2E python tools/e2e_pipeline_bench.py --train --train-crop --steps 320 --batch 24 --spc 16 --out $E2E
run_to 3000 $E2E python tools/e2e_pipeline_bench.py --extract --split val_seen --batch 200 --out $E2E
echo '{"queue_r04_e_done": true}' >> $TR
