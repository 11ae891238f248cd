#!/bin/bash
# Round-3 queue k: (1) per-op device trace of the train step (where do the
# ~361 on-chip ms go?), (2) same-batch scan probes — if the per-dispatch
# overhead is footprint-scaled, dropping the (K, B, ...) input stack should
# collapse it and lift measured samples/s toward the on-chip asymptote.
cd /root/repo
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=500
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
run_env python tools/trace_train_step.py --batch 128 --scan 8 --remat-policy dots --host-crop
run_env python bench.py --train --host-crop --batch 128 --scan 128 --remat-policy dots --rbg --same-batch
run_env python bench.py --train --host-crop --batch 128 --scan 160 --remat-policy dots --rbg --same-batch
run_env python bench.py --train --host-crop --batch 128 --scan 192 --remat-policy dots --rbg --same-batch
echo '{"done11": true}' >> "$OUT"
