#!/bin/bash
# Round-4 queue a — the VERDICT r3 execution-evidence items, serialized on
# the one tunneled chip:
#   1-3. pipeline-fed END-TO-END benches against the realistic 63.5k-record
#        BIOSCAN-shaped fixture (loader ceiling, extraction, bounded train
#        epoch) -> BENCH_E2E_r04.jsonl
#   4-5. batch-400 GradCache A/B of the new stage-1 image batching
#        (tpu.gc_s1_image_batch) -> BENCH_TRAIN_sweep_r04.jsonl
#   6.   serve the 5M int8 database on chip -> SERVE_5M_r04.json
cd /root/repo
for i in $(seq 1 60); do
  if timeout 180 python -c "import jax; d=jax.devices()[0]; print(d)" 2>/dev/null | grep -qi tpu; then
    echo "tunnel up after probe $i"; break
  fi
  echo "probe $i: unavailable; sleep 60"; sleep 60
done
E2E=BENCH_E2E_r04.jsonl
TR=BENCH_TRAIN_sweep_r04.jsonl
run_to() {
  local tmo=$1 out=$2; shift 2
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$out"
  ERR=/tmp/qa_err_$RANDOM.log
  timeout "$tmo" "$@" 2>"$ERR" | tail -1 >> "$out"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"tail\": \"$(tail -4 "$ERR" | tr '\n' ' ' | tr '"' "'" )\"}" >> "$out"
  fi
}
run_to 1800 $E2E python tools/e2e_pipeline_bench.py --loader-only --steps 40 --batch 200 --out $E2E
run_to 2400 $E2E python tools/e2e_pipeline_bench.py --extract --split val_seen --batch 200 --out $E2E
run_to 3600 $E2E python tools/e2e_pipeline_bench.py --train --steps 320 --batch 24 --spc 16 --out $E2E
run_to 7200 $TR python bench.py --train --batch 400 --gradcache 20 --scan 16 --remat-policy dots --rbg --same-batch --host-crop --frozen-bf16 --dispatches 3 --s1-image-batch 100
run_to 7200 $TR python bench.py --train --batch 400 --gradcache 20 --scan 16 --remat-policy dots --rbg --same-batch --host-crop --frozen-bf16 --dispatches 3 --s1-image-batch 400
run_to 5400 SERVE_5M_r04.json python tools/smoke_serve_tpu.py --keys 5000000 --precision int8 --device-image
echo '{"queue_r04_a_done": true}' >> $TR
