#!/bin/bash
# Round-5 queue E: fast-LN A/B retries with compile-weather-proof timeouts
# (the 900/1200 s queue-B slots died in >15-min compile weather), then the
# batch-400 record attempt at scan 64. Waits for queue D.
cd "$(dirname "$0")/.." || exit 1

while [ ! -f /tmp/qd5_done ]; do sleep 15; done

N=0
run_to() {
  local tmo=$1 out=$2; shift 2
  N=$((N+1))
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$out"
  ERR=/tmp/qe5_err_${N}.log
  timeout "$tmo" "$@" 2>"$ERR" | tail -1 >> "$out"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"stderr\": \"/tmp/qe5_err_${N}.log\", \"tail\": $(tail -2 "$ERR" | head -c 300 | python -c 'import json,sys; print(json.dumps(sys.stdin.read()))')}" >> "$out"
  fi
}

T=BENCH_TRAIN_sweep_r05.jsonl
B400="--train --batch 400 --rbg --same-batch --host-crop --frozen-bf16 --remat-policy dots"

run_to 3600 $T env BSCAN_FAST_LN=1 python bench.py --champion
run_to 3600 $T env BSCAN_FAST_LN=1 python bench.py $B400 --gradcache 20 --s1-chunk 100 --scan 16 --dispatches 3
run_to 3600 $T env BSCAN_FAST_LN=1 python bench.py $B400 --gradcache 20 --s1-chunk 100 --scan 64 --dispatches 2
echo "queue E done" >> /tmp/qe5_done
