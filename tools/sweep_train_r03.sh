#!/bin/bash
# Round-3 train-throughput sweep: host-crop (224^2 uint8) K-steps-per-dispatch.
# Runs SEQUENTIALLY (one TPU process at a time — axon tunnel constraint).
# Appends one JSON line per run to BENCH_TRAIN_sweep_r03.jsonl.
cd /root/repo
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=0
run() {
  N=$((N+1))
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$OUT"
  ERR=/tmp/sweep_err_$N.log
  timeout 3600 python bench.py --train --remat --host-crop "$@" 2>"$ERR" \
    | tail -1 >> "$OUT"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"args\": \"$*\", \"tail\": \"$(tail -4 "$ERR" | tr '\n' ' ' | tr '"' "'" )\"}" >> "$OUT"
  fi
}
run --batch 128 --scan 256
run --batch 256 --scan 128
run --batch 128 --scan 288
echo '{"done": true}' >> "$OUT"
