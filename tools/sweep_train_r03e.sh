#!/bin/bash
# Round-3 host-crop train sweep, take 2 (chains after sweep_train_r03d.sh).
# The pre-cropped device path is now elementwise-only (host_train_augment
# does all geometry on the loader pool) — re-try the K values that crashed
# the TPU worker when rotation/crop gathers ran on scan-sliced uint8.
# Stacked uint8 footprint at B=128: K=192 -> 3.6 GB, 256 -> 4.8, 384 -> 7.2,
# 512 -> 9.7 (HBM 15.75 GB; round-2 max observed resident was 4.83 GB).
cd /root/repo
while kill -0 "$(cat /tmp/sweep_r03d.pid)" 2>/dev/null; do sleep 30; done
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=60
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
run_env python bench.py --train --remat --host-crop --batch 128 --scan 192
run_env python bench.py --train --remat --host-crop --batch 128 --scan 256
run_env python bench.py --train --remat --host-crop --batch 128 --scan 384
run_env python bench.py --train --remat --host-crop --batch 128 --scan 512
echo '{"done5": true}' >> "$OUT"
