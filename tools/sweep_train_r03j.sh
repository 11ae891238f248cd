#!/bin/bash
# Round-3 queue j: attack the ~365 ms on-chip step (remat-policy dots is the
# established best). A/B the per-step suspects — fp32 LayerNorm passes
# (BSCAN_FAST_LN), threefry dropout/aug PRNG (--rbg), dropout entirely
# (--no-dropout, diagnostic) — plus K=152 at the watchdog edge.
cd /root/repo
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=400
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
run_env python bench.py --train --host-crop --batch 128 --scan 152 --remat-policy dots
run_env BSCAN_FAST_LN=1 python bench.py --train --host-crop --batch 128 --scan 128 --remat-policy dots
run_env python bench.py --train --host-crop --batch 128 --scan 128 --remat-policy dots --rbg
run_env python bench.py --train --host-crop --batch 128 --scan 128 --remat-policy dots --no-dropout
echo '{"done10": true}' >> "$OUT"
