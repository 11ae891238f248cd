#!/bin/bash
# Round-5 queue A: serialized chip work after the first grouped-extraction
# run (compiles now land in the persistent cache, so reruns measure steady
# state). One JSON line per run into the round-5 bench logs.
cd "$(dirname "$0")/.." || exit 1

# wait for the in-flight extraction bench (writes /tmp/r05_extract.pid)
if [ -f /tmp/r05_extract.pid ]; then
  while kill -0 "$(cat /tmp/r05_extract.pid)" 2>/dev/null; do sleep 10; done
fi

N=0
run_to() {
  local tmo=$1 out=$2; shift 2
  N=$((N+1))
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$out"
  ERR=/tmp/qa5_err_${N}.log
  timeout "$tmo" "$@" 2>"$ERR" | tail -1 >> "$out"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"stderr\": \"/tmp/qa5_err_${N}.log\", \"tail\": $(tail -2 "$ERR" | head -c 300 | python -c 'import json,sys; print(json.dumps(sys.stdin.read()))')}" >> "$out"
  fi
}

E2E=BENCH_E2E_r05.jsonl
# cached-compile rerun: the honest steady extraction rate, default group 1600
run_to 1800 $E2E python tools/e2e_pipeline_bench.py --extract --split val_seen --batch 200 --out $E2E
# group-size A/B: 3200-row groups (fewer dispatches, bigger transfer)
BSCAN_EXTRACT_GROUP=3200 run_to 1800 $E2E python tools/e2e_pipeline_bench.py --extract --split val_seen --batch 200 --out $E2E
# loader-only eval-path ceiling at batch 200 for the decomposition row
run_to 1200 $E2E python tools/e2e_pipeline_bench.py --loader-only --steps 40 --batch 200 --out $E2E

# top-k kernel decomposition (VERDICT #4): matmul-only floor vs production
TK=BENCH_TOPK_r05.jsonl
run_to 3600 $TK python tools/bench_topk_variants.py --keys 1048576 --queries 1024 --out $TK

# bf16-vs-f32 rescore agreement at 5M keys (VERDICT #8)
RS=BENCH_RESCORE_r05.jsonl
run_to 3600 $RS python tools/bench_rescore_agreement.py --keys 5000000 --queries 4096 --out $RS
echo "queue A done" >> /tmp/qa5_done
