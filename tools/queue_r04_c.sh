#!/bin/bash
# Round-4 queue c (after queue_r04_a2.sh): per-op trace A/B across the
# batch ladder (VERDICT r3 item 3 — name the mechanism behind the
# superlinear step cost: which op category grows faster than B).
cd /root/repo
if [ -f /tmp/queue_a2.pid ]; then
  while kill -0 "$(cat /tmp/queue_a2.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 60); do
  if timeout 180 python -c "import jax; d=jax.devices()[0]; print(d)" 2>/dev/null | grep -qi tpu; then
    echo "tunnel up after probe $i"; break
  fi
  echo "probe $i: unavailable; sleep 60"; sleep 60
done
OUT=TRACE_LADDER_r04.jsonl
run_to() {
  local tmo=$1; shift
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$OUT"
  ERR=/tmp/qc_err_$RANDOM.log
  timeout "$tmo" "$@" 2>"$ERR" | tail -1 >> "$OUT"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"tail\": \"$(tail -4 "$ERR" | tr '\n' ' ' | tr '"' "'" )\"}" >> "$OUT"
  fi
}
run_to 2400 python tools/trace_train_step.py --batch 24 --scan 8 --remat-policy dots --host-crop --rbg
run_to 2400 python tools/trace_train_step.py --batch 64 --scan 8 --remat-policy dots --host-crop --rbg
run_to 2400 python tools/trace_train_step.py --batch 128 --scan 8 --remat-policy dots --host-crop --rbg
echo '{"queue_r04_c_done": true}' >> $OUT
