#!/bin/bash
# Round-3 queue p: B=64 dots measured 2.39 ms/sample on-chip (vs 2.66 at
# B=128) — ride it with higher K inside the watchdog, plus a B=96 point.
cd /root/repo
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=950
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
run_env python bench.py --train --host-crop --batch 64 --scan 352 --remat-policy dots --rbg --same-batch
run_env python bench.py --train --host-crop --batch 96 --scan 224 --remat-policy dots --rbg --same-batch
echo '{"done16": true}' >> "$OUT"
