#!/bin/bash
# Follow-up to sweep_train_r03.sh: waits for it to exit, then
# 1) dropout-kernel TPU smoke (tiny; disambiguates Mosaic fault vs HBM OOM)
# 2) conservative K values below the known-good ~4.8 GB stacked-batch ceiling
cd /root/repo
while kill -0 "$(cat /tmp/sweep_r03.pid)" 2>/dev/null; do sleep 30; done
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=10
run_py() {
  N=$((N+1))
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$OUT"
  ERR=/tmp/sweep_err_$N.log
  timeout 3600 "$@" 2>"$ERR" | tail -1 >> "$OUT"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"args\": \"$*\", \"tail\": \"$(tail -4 "$ERR" | tr '\n' ' ' | tr '"' "'" )\"}" >> "$OUT"
  fi
}
run_py python tools/smoke_dropout_tpu.py
run_py python bench.py --train --remat --host-crop --batch 128 --scan 192
run_py python bench.py --train --remat --host-crop --batch 128 --scan 224
run_py python bench.py --train --remat --host-crop --batch 256 --scan 112
echo '{"done2": true}' >> "$OUT"
