#!/bin/bash
# Round-3 queue g: creep K toward the ~68 s watchdog with host-crop, then
# extraction-throughput experiments (fast-LN knob, bigger batch).
cd /root/repo
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=100
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
run_env python bench.py --train --remat --host-crop --batch 128 --scan 144
run_env python bench.py --train --remat --host-crop --batch 128 --scan 152
run_env BSCAN_FAST_LN=1 python bench.py
run_env python bench.py --batch 512
run_env BSCAN_FAST_LN=1 python bench.py --batch 512
echo '{"done7": true}' >> "$OUT"
