#!/bin/bash
# Round-4 queue d — serialized on the one tunneled chip:
#   1. host->device transfer probe (the tunnel-bandwidth denominator for
#      every e2e number)
#   2. loader-only ceiling with host RandomResizedCrop (224x224 shipped)
#   3. extract e2e RERUN — the r4 producer stop-sentinel fix unwedges the
#      end-of-split q.get hang that ate the first attempt's 2400 s timeout
#   4. train e2e with --train-crop (3.6 MB/batch over the tunnel instead
#      of 28 MB full-res)
#   5-9. batch-400 GradCache squeeze: s1-image-batch ladder, mb=25,
#      no-remat, dots_act -> close the 0.985x gap to the 450/s target
cd /root/repo
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
  ERR=/tmp/qd_err_${N}.log
  timeout "$tmo" "$@" 2>"$ERR" | tail -1 >> "$out"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"stderr\": \"/tmp/qd_err_${N}.log\", \"tail\": \"$(tail -4 "$ERR" | tr '\n' ' ' | tr '"' "'" )\"}" >> "$out"
  fi
}
run_to 900  $E2E python tools/e2e_pipeline_bench.py --transfer-probe --out $E2E
run_to 1800 $E2E python tools/e2e_pipeline_bench.py --loader-only --train-crop --steps 40 --batch 200 --out $E2E
run_to 3000 $E2E python tools/e2e_pipeline_bench.py --extract --split val_seen --batch 200 --out $E2E
run_to 3600 $E2E python tools/e2e_pipeline_bench.py --train --train-crop --steps 320 --batch 24 --spc 16 --out $E2E
GC="python bench.py --train --batch 400 --scan 16 --rbg --same-batch --host-crop --frozen-bf16 --dispatches 3"
run_to 2400 $TR $GC --gradcache 20 --remat-policy dots --s1-image-batch 50
run_to 2400 $TR $GC --gradcache 20 --remat-policy dots --s1-image-batch 80
run_to 2400 $TR $GC --gradcache 16 --remat-policy dots --s1-image-batch 50
run_to 2400 $TR $GC --gradcache 20 --s1-image-batch 100
run_to 2400 $TR $GC --gradcache 20 --remat-policy dots_act --s1-image-batch 100
echo '{"queue_r04_d_done": true}' >> $TR
