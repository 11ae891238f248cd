"""bf16-vs-f32 rescore ranking agreement at 5M-key scale (VERDICT r4 #8).

The int8 serving path oversamples quantized candidates and re-scores them
against host rows; `rescore="bfloat16"` stores those host rows in bf16
(halving the host-RAM tax). Round-4 tests proved ranking safety only on
small random sets — this measures the top-1/top-5 disagreement rate
between bf16-rescored and f32-rescored rankings ON the 5M random-key DB,
on the chip, and appends one JSON line to --out.

    python tools/bench_rescore_agreement.py [--keys 5000000] [--queries 4096]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

try:
    from bioscan_clip_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
except Exception:
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=5_000_000)
    ap.add_argument("--queries", type=int, default=4096)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--out", default="BENCH_RESCORE_r05.jsonl")
    args = ap.parse_args()

    from bioscan_clip_tpu.retrieval.engine import PreparedKeys, topk_search

    rng = np.random.default_rng(7)
    ks = np.empty((args.keys, args.dim), np.float32)
    for s in range(0, args.keys, 1_000_000):
        e = min(s + 1_000_000, args.keys)
        block = rng.standard_normal((e - s, args.dim)).astype(np.float32)
        block /= np.linalg.norm(block, axis=1, keepdims=True)
        ks[s:e] = block
    q = rng.standard_normal((args.queries, args.dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    rows = {}
    results = {}
    for mode in ("float32", "bfloat16"):
        pk = PreparedKeys(ks, precision="int8", normalized=True,
                          rescore=mode)
        t0 = time.perf_counter()
        sims, idxs = topk_search(q, pk, k=args.k)
        dt = time.perf_counter() - t0
        results[mode] = (np.asarray(sims), np.asarray(idxs))
        rows[f"{mode}_search_s"] = round(dt, 3)
        del pk

    (s_f32, i_f32), (s_b16, i_b16) = results["float32"], results["bfloat16"]
    top1_disagree = float((i_f32[:, 0] != i_b16[:, 0]).mean())
    # set-level top-k agreement (order-insensitive)
    setk_disagree = float(np.mean([
        len(set(a.tolist()) ^ set(b.tolist())) > 0
        for a, b in zip(i_f32, i_b16)
    ]))
    # score drift on the f32-ranked winners
    drift = float(np.max(np.abs(s_f32[:, 0] - s_b16[:, 0])))
    row = {
        "mode": "rescore_agreement",
        "keys": args.keys,
        "queries": args.queries,
        "k": args.k,
        "top1_disagreement_rate": top1_disagree,
        f"top{args.k}_set_disagreement_rate": setk_disagree,
        "max_top1_score_drift": round(drift, 6),
        **rows,
    }
    line = json.dumps(row)
    print(line, flush=True)
    with open(args.out, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
