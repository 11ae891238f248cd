#!/bin/bash
# Round-3 queue o: no-remat at B=64 (activations ~halve; same_batch freed
# the stacked-input HBM) — removes both the backward recompute AND the
# dots policy's save traffic. dots at the same B/K for an apples A/B.
cd /root/repo
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=900
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
run_env python bench.py --train --host-crop --batch 64 --scan 256 --rbg --same-batch
run_env python bench.py --train --host-crop --batch 64 --scan 256 --remat-policy dots --rbg --same-batch
echo '{"done15": true}' >> "$OUT"
