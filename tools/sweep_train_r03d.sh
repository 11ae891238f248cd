#!/bin/bash
# Final round-3 TPU queue (chains after sweep_train_r03c.sh):
#  1) headline extraction bench (fresh number with round-3 code)
#  2) retrieval spot-check post-PreparedKeys refactor (1M keys, exact)
#  3) if train numbers are still missing, one more host-crop attempt
cd /root/repo
while kill -0 "$(cat /tmp/sweep_r03c.pid)" 2>/dev/null; do sleep 30; done
OUT=BENCH_TRAIN_sweep_r03.jsonl
N=40
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
run_env python bench.py
run_env python tools/bench_retrieval.py --keys 1000000 --queries 512
echo '{"done4": true}' >> "$OUT"
