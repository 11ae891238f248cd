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

try:  # persistent XLA compilation cache (tunnel compiles are 20s-30min)
    from bioscan_clip_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
except Exception:
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=5_000_000)
    ap.add_argument("--queries", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--precision", default="high",
                    choices=["default", "high", "highest", "int8"],
                    help="int8: per-row-quantized resident keys (4x "
                    "capacity; 5M x 768 fits one 16 GB chip) + fp32 "
                    "rescore of an oversampled candidate pool")
    ap.add_argument("--prepared", action="store_true",
                    help="build PreparedKeys outside the timer (resident-"
                    "DB serving latency, excludes quantize+upload)")
    ap.add_argument("--layout", default="random",
                    choices=["random", "ascending", "descending"],
                    help="adversarial key order for the threshold-gated "
                    "merge (ops/topk_pallas.py): 'ascending' sorts keys by "
                    "similarity to the (clustered) queries so EVERY tile "
                    "improves the running top-k — the kernel's documented "
                    "worst case; 'descending' is the best case (first tile "
                    "gates out the rest)")
    args = ap.parse_args()

    from bioscan_clip_tpu.retrieval.engine import PreparedKeys, topk_search

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
    if args.layout != "random":
        # cluster the queries around one direction and order the keys by
        # similarity to it -> per-query scores are (near-)monotonic in the
        # key index, forcing the gated merge into its worst/best case
        d = rng.standard_normal(args.dim).astype(np.float32)
        d /= np.linalg.norm(d)
        order = np.argsort(ks @ d)
        if args.layout == "descending":
            order = order[::-1]
        ks = np.ascontiguousarray(ks[order])
        q = d[None, :] + 0.05 * q
        q /= np.linalg.norm(q, axis=1, keepdims=True)

    if not args.prepared:
        # warm (compiles the kernel at slab shape)
        topk_search(q[:8], ks[: min(args.keys, 1_000_000)], args.k,
                    precision=args.precision)

    prep_s = None
    target = ks
    if args.prepared:
        t0 = time.perf_counter()
        target = PreparedKeys(ks, precision=args.precision,
                              normalized=True)
        prep_s = round(time.perf_counter() - t0, 3)
        # warm at the FULL resident key AND query-block shape so the timed
        # search below measures search, not this program's kernel compile
        topk_search(q, target, args.k, precision=args.precision)
    t0 = time.perf_counter()
    sims, idx = topk_search(q, target, args.k, precision=args.precision)
    dur = time.perf_counter() - t0

    # spot-check exactness on a small query subset
    sub = q[:4]
    ref = sub @ ks.T
    ref_top = np.sort(ref, axis=1)[:, -args.k:][:, ::-1]
    got = sims[:4]
    # int8 returns fp32-rescored scores -> exact for the recalled indices
    atol = {"default": 5e-2, "high": 2e-3, "highest": 1e-3,
            "int8": 1e-4}[args.precision]
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
        "prepared_s": prep_s,
        "layout": args.layout,
        "exact_spot_check": ok,
    }))


if __name__ == "__main__":
    main()
