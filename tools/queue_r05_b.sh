#!/bin/bash
# Round-5 queue B: batch-400 retune (VERDICT r4 #3) + fast-LN train A/B.
# Serialized chip work; waits for the in-flight rescore bench first.
cd "$(dirname "$0")/.." || exit 1

if [ -f /tmp/rescore.pid ]; then
  while kill -0 "$(cat /tmp/rescore.pid)" 2>/dev/null; do sleep 15; done
fi

N=0
run_to() {
  local tmo=$1 out=$2; shift 2
  N=$((N+1))
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$out"
  ERR=/tmp/qb5_err_${N}.log
  timeout "$tmo" "$@" 2>"$ERR" | tail -1 >> "$out"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"stderr\": \"/tmp/qb5_err_${N}.log\", \"tail\": $(tail -2 "$ERR" | head -c 300 | python -c 'import json,sys; print(json.dumps(sys.stdin.read()))')}" >> "$out"
  fi
}

T=BENCH_TRAIN_sweep_r05.jsonl
B400="--train --batch 400 --rbg --same-batch --host-crop --frozen-bf16 --remat-policy dots --dispatches 3"

# fast-LN on the plain-step champion (B=24): bf16 normalize, f32 stats
run_to 900 $T python bench.py --champion
run_to 900 $T env BSCAN_FAST_LN=1 python bench.py --champion

# batch-400 geometry ladder (s1-chunk 200/400 never measured post-fix;
# gradcache 25/40 rides the VMEM-residency trend 8->16->20)
run_to 1200 $T python bench.py $B400 --gradcache 20 --s1-chunk 200 --scan 16
run_to 1200 $T python bench.py $B400 --gradcache 20 --s1-chunk 400 --scan 16
run_to 1200 $T python bench.py $B400 --gradcache 25 --s1-chunk 100 --scan 16
run_to 1200 $T python bench.py $B400 --gradcache 40 --s1-chunk 100 --scan 16
# fast-LN at batch 400 on the round-4 champion geometry
run_to 1200 $T env BSCAN_FAST_LN=1 python bench.py $B400 --gradcache 20 --s1-chunk 100 --scan 16

# cold-cache loader: global permutation vs window shuffle on the
# realistic-density fixture (VERDICT r4 #6 measurement half)
run_to 3600 BENCH_LOADER_COLD_r05.jsonl python tools/bench_loader_coldcache.py \
  --fixture /tmp/bscan_fixture/realistic_1m.hdf5 --windows 0,1024,16384 \
  --steps 30 --batch 200 --out BENCH_LOADER_COLD_r05.jsonl

echo "queue B done" >> /tmp/qb5_done
