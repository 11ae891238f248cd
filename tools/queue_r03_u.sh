#!/bin/bash
# Round-3 queue u (after queue_r03_t.sh):
#  1) champion + --frozen-bf16 (halved frozen-weight HBM reads; bit-identical
#     under bf16 compute) with best-of-5 dispatches — record attempt
#  2) smaller-batch ladder: B=48 K=512 and B=32 K=768 at dots — probes
#     whether the B=64 on-chip optimum (2.39 ms/sample) extends down
#  3) dots_act champion variant (only meaningful if queue_t's K=64 A/B
#     favored dots_act; harmless A/B data point regardless)
# ONE TPU process at a time; append to the jsonl log.
cd /root/repo
for i in $(seq 1 200); do
  if timeout 180 python -c "import jax; d=jax.devices()[0]; print(d)" 2>/dev/null | grep -qi tpu; then
    echo "tunnel back after probe $i"; break
  fi
  echo "probe $i: unavailable; sleep 60"; sleep 60
done
TOUT=BENCH_TRAIN_sweep_r03.jsonl
run_to() {
  local out=$1; shift
  echo "{\"run\": \"$*\", \"t\": $(date +%s)}" >> "$out"
  ERR=/tmp/qu_err_$RANDOM.log
  timeout 3600 "$@" 2>"$ERR" | tail -1 >> "$out"
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": $rc, \"tail\": \"$(tail -4 "$ERR" | tr '\n' ' ' | tr '"' "'" )\"}" >> "$out"
  fi
}
run_to $TOUT python bench.py --champion --frozen-bf16 --dispatches 5
run_to $TOUT python bench.py --train --host-crop --batch 48 --scan 512 --remat-policy dots --rbg --same-batch --dispatches 2
run_to $TOUT python bench.py --train --host-crop --batch 32 --scan 768 --remat-policy dots --rbg --same-batch --dispatches 2
# LN cost isolation at flagship shapes (trace: LN fusions are the largest
# non-matmul cluster; decides whether a Pallas LN kernel is worth building)
run_to $TOUT python tools/smoke_ln_bwd_tpu.py --tpu --batch 64 --n 197 --k 200
# int8 retrieval: resident 5M x 768 (3.8 GB quantized) vs the fp32 slab
# streaming path; --prepared isolates search latency from quantize+upload
run_to $TOUT python tools/bench_retrieval.py --keys 1000000 --precision int8 --prepared
run_to $TOUT python tools/bench_retrieval.py --keys 5000000 --precision int8 --prepared
echo '{"queue_u_done": true}' >> $TOUT
