#!/bin/bash
# Round-3 final TPU queue: watchdog bisect + host-crop train bench at safe K.
# The worker kills dispatches executing longer than ~70-90 s (probe_exec_
# watchdog.py: 66.5 s ok, ~90 s crash, 8 MB footprint) — so K is chosen to
# keep execution under the limit, not under an HBM budget.
cd /root/repo
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=80
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
# 1) bisect the execution-time limit (each target logs independently)
run_env python tools/probe_exec_watchdog.py --iters-sweep 700000
run_env python tools/probe_exec_watchdog.py --iters-sweep 800000
# 2) host-crop measured train number at the safe K
run_env python bench.py --train --remat --host-crop --batch 128 --scan 128
# 3) push K to the watchdog edge with the lighter host-crop program
run_env python bench.py --train --remat --host-crop --batch 128 --scan 144
echo '{"done6": true}' >> "$OUT"
