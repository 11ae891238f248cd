#!/bin/bash
# Round-3 queue i: remat save-policies ("dots" keeps MXU outputs, "narrow"
# keeps attention ctx + pre-GELU MLP) — cut the +1-forward recompute cost
# of full per-layer remat without the no-remat OOM (22.3G > 15.75G).
cd /root/repo
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=300
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
run_env python bench.py --train --host-crop --batch 128 --scan 128 --remat-policy dots
run_env python bench.py --train --host-crop --batch 128 --scan 128 --remat-policy narrow
run_env python bench.py --train --host-crop --batch 128 --scan 192 --remat-policy dots
run_env python bench.py --train --host-crop --batch 128 --scan 192 --remat-policy narrow
echo '{"done9": true}' >> "$OUT"
