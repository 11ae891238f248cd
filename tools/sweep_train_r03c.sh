#!/bin/bash
# Bisect the round-3 TPU worker crashes. Chains after sweep_train_r03b.sh.
# Suspect #1: the pre-cropped train_transform path lacked the
# optimization_barrier between the uint8 cast and random_rotation's vmap'd
# gather (fixed in data/transforms.py) — every crashed run used --host-crop.
# Order of information:
#  1) dropout-kernel smoke (tiny) — direct Mosaic kernel test
#  2) EXACT round-2-good config (B=128 K=128, 256x384) on the new code
#     (dropout kernel in the training path, no host-crop)
#  3) host-crop K=192 with the barrier fix
#  4) host-crop K=256 (the target measurement)
#  5) B=256 K=128 host-crop
cd /root/repo
while kill -0 "$(cat /tmp/sweep_r03b.pid)" 2>/dev/null; do sleep 30; done
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=20
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
run_env python tools/smoke_dropout_tpu.py
run_env python bench.py --train --remat --batch 128 --scan 128
run_env python bench.py --train --remat --host-crop --batch 128 --scan 192
run_env python bench.py --train --remat --host-crop --batch 128 --scan 256
run_env python bench.py --train --remat --host-crop --batch 256 --scan 128
echo '{"done3": true}' >> "$OUT"
