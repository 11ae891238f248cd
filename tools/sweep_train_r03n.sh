#!/bin/bash
# Round-3 queue n: the 'wide' remat policy (saved LN outputs — no LN
# recompute in the backward) at the best-known recipe, then a
# correctly-configured (rbg) re-trace for attribution.
cd /root/repo
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=800
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
run_env python bench.py --train --host-crop --batch 128 --scan 128 --remat-policy wide --rbg --same-batch
run_env python bench.py --train --host-crop --batch 128 --scan 160 --remat-policy wide --rbg --same-batch
run_env python tools/trace_train_step.py --batch 128 --scan 8 --remat-policy wide --host-crop --rbg
echo '{"done14": true}' >> "$OUT"
