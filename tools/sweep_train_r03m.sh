#!/bin/bash
# Round-3 queue m: narrow remat policy (skips the dots policy's
# dynamic-update-slice saves of qkv/fc1 — trace shows those cost more HBM
# traffic than their recompute) + rbg, at the K=160 sweet spot.
cd /root/repo
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=700
run_env() {
  N=$((N+1))
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$OUT"
  ERR=/tmp/sweep_err_$N.log
  timeout 3600 env "$@" 2>"$ERR" | tail -1 >> "$OUT"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"args\": \"$*\", \"tail\": \"$(tail -4 "$ERR" | tr '\n' ' ' | tr '"' "'" )\"}" >> "$OUT"
  fi
}
run_env python bench.py --train --host-crop --batch 128 --scan 160 --remat-policy narrow --rbg --same-batch
run_env python bench.py --train --host-crop --batch 128 --scan 176 --remat-policy narrow --rbg --same-batch
echo '{"done13": true}' >> "$OUT"
