#!/bin/bash
# Round-3 queue l: flat-scan probes. Theory (PERF_NOTES r3): the ~19 s
# per-dispatch cost is the donated full-TrainState round trip (fp32 param
# tree); extraction's non-donated standing args show ~zero dispatch cost.
# make_flat_scan_train_step donates only the O(trainable) carry — if the
# theory holds, D collapses and measured samples/s approaches the on-chip
# asymptote (~128/0.34 = 376/s). Then: no-remat (activation fit freed by
# dropping the (K,B,...) stack) to cut the dots recompute, and a re-trace.
cd /root/repo
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=600
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
run_env python bench.py --train --host-crop --batch 128 --scan 128 --remat-policy dots --rbg --same-batch --flat-scan
run_env python bench.py --train --host-crop --batch 128 --scan 64 --remat-policy dots --rbg --same-batch --flat-scan
run_env python bench.py --train --host-crop --batch 128 --scan 64 --rbg --same-batch --flat-scan
run_env python tools/trace_train_step.py --batch 128 --scan 8 --remat-policy dots --host-crop
echo '{"done12": true}' >> "$OUT"
