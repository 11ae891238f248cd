#!/bin/bash
# Round-4 queue h — replaces queue-g's tail after its two GC runs:
#   0. batch-400 GradCache --scan 64 on a QUIET host (the K-ladder
#      extrapolates 888.55 + 25/K ms/step -> 450.0 samples/s at K=64;
#      56.9 s/dispatch stays under the ~70 s tunnel watchdog).
#   1. rebuild the realistic fixture (wiped /tmp).
#   2-5. transfer probe + loader-only + train/extract e2e, uncontended.
#   6. full CPU test suite, logged.
cd /root/repo
TR=BENCH_TRAIN_sweep_r04.jsonl
N=0
run_to() {
  local tmo=$1 out=$2; shift 2
  N=$((N+1))
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$out"
  ERR=/tmp/qh_err_${N}.log
  timeout "$tmo" "$@" 2>"$ERR" | tail -1 >> "$out"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"stderr\": \"/tmp/qh_err_${N}.log\", \"tail\": $(tail -2 "$ERR" | head -c 300 | python -c 'import json,sys; print(json.dumps(sys.stdin.read()))')}" >> "$out"
  fi
}
GC="python bench.py --train --batch 400 --rbg --same-batch --host-crop --frozen-bf16 --gradcache 20 --remat-policy dots --s1-chunk 100"
run_to 2400 $TR $GC --scan 64 --dispatches 3
FIX=/tmp/bscan_fixture/realistic_1m.hdf5
if [ ! -f $FIX ]; then
  timeout 3600 python tools/make_realistic_fixture.py $FIX > /tmp/qh_fixture.log 2>&1
fi
E2E=BENCH_E2E_r04.jsonl
run_to 1200 $E2E python tools/e2e_pipeline_bench.py --transfer-probe --out $E2E
run_to 1800 $E2E python tools/e2e_pipeline_bench.py --loader-only --train-crop --steps 40 --batch 200 --out $E2E
run_to 3600 $E2E python tools/e2e_pipeline_bench.py --train --train-crop --steps 320 --batch 24 --spc 16 --out $E2E
run_to 3000 $E2E python tools/e2e_pipeline_bench.py --extract --split val_seen --batch 200 --out $E2E
echo '{"queue_r04_h_benches_done": true}' >> $E2E
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 3000 python -m pytest tests/ -q > /tmp/suite_r04c.log 2>&1
echo "EXIT=$?" >> /tmp/suite_r04c.log
echo '{"queue_r04_h_done": true}' >> $E2E
