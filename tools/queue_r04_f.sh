#!/bin/bash
# Round-4 queue f — after the SMEM full-array fix (2ecf8c3):
#   1-2. batch-400 GradCache with fully-chunked stage 1 (--s1-chunk),
#        the row-keyed-dropout lever (queue-e attempts hit the Mosaic
#        rank-1 SMEM constraint pre-fix)
#   3.   champion sanity re-run (bench --champion) on the current tree
cd /root/repo
if [ -f /tmp/queue_e.pid ]; then
  while kill -0 "$(cat /tmp/queue_e.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 60); do
  if timeout 180 python -c "import jax; d=jax.devices()[0]; print(d)" 2>/dev/null | grep -qi tpu; then
    echo "tunnel up after probe $i"; break
  fi
  echo "probe $i: unavailable; sleep 60"; sleep 60
done
TR=BENCH_TRAIN_sweep_r04.jsonl
N=0
run_to() {
  local tmo=$1 out=$2; shift 2
  N=$((N+1))
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$out"
  ERR=/tmp/qf_err_${N}.log
  timeout "$tmo" "$@" 2>"$ERR" | tail -1 >> "$out"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"stderr\": \"/tmp/qf_err_${N}.log\", \"tail\": \"$(tail -2 "$ERR" | tr '\n' ' ' | tr '"' "'" | head -c 300)\"}" >> "$out"
  fi
}
GC="python bench.py --train --batch 400 --scan 16 --rbg --same-batch --host-crop --frozen-bf16 --dispatches 3 --gradcache 20"
run_to 3000 $TR $GC --remat-policy dots --s1-chunk 100
run_to 3000 $TR $GC --remat-policy dots_act --s1-chunk 100
run_to 2400 $TR python bench.py --champion
# e2e reruns MUST run on a quiet host (queue-e's overlapped the CPU test
# suite and under-measured: train_e2e 32.9/s vs 54.7 uncontended) — wait
# for the suite marker first
while ! grep -q EXIT= /tmp/suite_r04b.log 2>/dev/null; do sleep 60; done
E2E=BENCH_E2E_r04.jsonl
run_to 1800 $E2E python tools/e2e_pipeline_bench.py --loader-only --train-crop --steps 40 --batch 200 --out $E2E
run_to 3600 $E2E python tools/e2e_pipeline_bench.py --train --train-crop --steps 320 --batch 24 --spc 16 --out $E2E
run_to 3000 $E2E python tools/e2e_pipeline_bench.py --extract --split val_seen --batch 200 --out $E2E
echo '{"queue_r04_f_done": true}' >> $TR
