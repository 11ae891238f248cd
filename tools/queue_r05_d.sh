#!/bin/bash
# Round-5 queue D: 5M int8 serving latency with the retiled kernel
# (SERVE_5M_r04 was measured at tile 512). Waits for queue C.
cd "$(dirname "$0")/.." || exit 1

while [ ! -f /tmp/qc5_done ]; do sleep 15; done

OUT=SERVE_5M_r05.json
echo "{\"run\": \"python tools/smoke_serve_tpu.py --keys 5000000 --precision int8 --device-image\", \"t\": $(date +%s)}" >> $OUT
timeout 3600 python tools/smoke_serve_tpu.py --keys 5000000 --precision int8 --device-image 2>/tmp/qd5_err.log | tail -1 >> $OUT
rc=${PIPESTATUS[0]}
if [ "$rc" -ne 0 ]; then
  echo "{\"error\": $rc, \"tail\": $(tail -2 /tmp/qd5_err.log | head -c 300 | python -c 'import json,sys; print(json.dumps(sys.stdin.read()))')}" >> $OUT
fi
echo "queue D done" >> /tmp/qd5_done
