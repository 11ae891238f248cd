#!/bin/bash
# Round-3 queue q: B=64+dots measured 2.39 ms/sample on-chip — push K to the
# watchdog edge (K=384 = ~59 s on-chip, K=416 = ~64 s; limit is ~70-90 s).
# Projection: 64*K/(K*0.153 + D~20-27 s) = ~295-315 samples/s wall.
cd /root/repo
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=970
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
run_env python bench.py --train --host-crop --batch 64 --scan 384 --remat-policy dots --rbg --same-batch
run_env python bench.py --train --host-crop --batch 64 --scan 416 --remat-policy dots --rbg --same-batch
echo '{"done17": true}' >> "$OUT"
