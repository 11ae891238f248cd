#!/bin/bash
# Round-5 queue C: re-measure headline retrieval rows with the retiled
# (tile-2048) kernel — the 5M int8 resident path and 1M fp32-HIGHEST.
# Waits for queue B.
cd "$(dirname "$0")/.." || exit 1

while [ ! -f /tmp/qb5_done ]; do sleep 15; done

N=0
run_to() {
  local tmo=$1 out=$2; shift 2
  N=$((N+1))
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$out"
  ERR=/tmp/qc5_err_${N}.log
  timeout "$tmo" "$@" 2>"$ERR" | tail -1 >> "$out"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"stderr\": \"/tmp/qc5_err_${N}.log\", \"tail\": $(tail -2 "$ERR" | head -c 300 | python -c 'import json,sys; print(json.dumps(sys.stdin.read()))')}" >> "$out"
  fi
}

R=BENCH_RETRIEVAL_r05.jsonl
run_to 2400 $R python tools/bench_retrieval.py --keys 5000000 --precision int8 --prepared
run_to 1800 $R python tools/bench_retrieval.py --keys 1000000 --precision highest --prepared
run_to 1800 $R python tools/bench_retrieval.py --keys 1000000 --precision int8 --prepared
echo "queue C done" >> /tmp/qc5_done
