#!/bin/bash
# Round-3 queue h: no-remat train step (fused-MHA training removed the
# (B,h,N,N) activation saves that caused the round-2 compile OOM), then
# batch/K scaling under the ~68 s execution watchdog.
cd /root/repo
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=200
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
run_env python bench.py --train --host-crop --batch 128 --scan 128
run_env python bench.py --train --host-crop --batch 128 --scan 192
run_env python bench.py --train --remat --host-crop --batch 256 --scan 80
run_env python bench.py --train --host-crop --batch 256 --scan 80
echo '{"done8": true}' >> "$OUT"
