"""Retrieval-at-scale benchmark: exact top-k over N keys on one chip.

SURVEY.md §2.9 requires the FAISS replacement to support key sets up to
~5M x 768 (the BIOSCAN-5M worst case, 15.4 GB fp32 > one v5e's HBM).
Measures the full topk_search path: device-resident fused Pallas kernel
for slabs, host-streamed slab merge above the HBM budget.

    python tools/bench_retrieval.py [--keys 5000000] [--queries 1024] [--k 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=5_000_000)
    ap.add_argument("--queries", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--precision", default="high",
                    choices=["default", "high", "highest"])
    args = ap.parse_args()

    from bioscan_clip_tpu.retrieval.engine import topk_search

    rng = np.random.default_rng(0)
    # generate in slabs to bound peak temp memory during normalization
    ks = np.empty((args.keys, args.dim), np.float32)
    for s in range(0, args.keys, 1_000_000):
        e = min(s + 1_000_000, args.keys)
        block = rng.standard_normal((e - s, args.dim)).astype(np.float32)
        block /= np.linalg.norm(block, axis=1, keepdims=True)
        ks[s:e] = block
    q = rng.standard_normal((args.queries, args.dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    # warm (compiles the kernel at slab shape)
    topk_search(q[:8], ks[: min(args.keys, 1_000_000)], args.k,
                precision=args.precision)

    t0 = time.perf_counter()
    sims, idx = topk_search(q, ks, args.k, precision=args.precision)
    dur = time.perf_counter() - t0

    # spot-check exactness on a small query subset
    sub = q[:4]
    ref = sub @ ks.T
    ref_top = np.sort(ref, axis=1)[:, -args.k:][:, ::-1]
    got = sims[:4]
    atol = {"default": 5e-2, "high": 2e-3, "highest": 1e-3}[args.precision]
    ok = bool(np.allclose(np.sort(got, axis=1)[:, ::-1], ref_top, atol=atol))

    flops = 2.0 * args.queries * args.keys * args.dim
    print(json.dumps({
        "metric": "retrieval_topk_latency",
        "keys": args.keys,
        "queries": args.queries,
        "dim": args.dim,
        "k": args.k,
        "seconds": round(dur, 3),
        "tflops_per_s": round(flops / dur / 1e12, 1),
        "queries_per_s": round(args.queries / dur, 1),
        "precision": args.precision,
        "exact_spot_check": ok,
    }))


if __name__ == "__main__":
    main()
