"""On-chip serving smoke: flagship RetrievalService end-to-end latency.

Builds the flagship towers (random weights — serving mechanics, not
accuracy), installs a 100k-key database, and measures:
- single-query DNA search latency (tokenize -> tower -> top-k -> labels)
- batch-64 image search latency (host eval preprocess -> tower -> top-k)
- batch-256 DNA embed throughput

    python tools/smoke_serve_tpu.py [--keys 100000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--precision", choices=["high", "int8"], default="high",
                    help="int8: resident quantized keys (the 5M-DB format)")
    ap.add_argument("--device-image", action="store_true",
                    help="device-side eval resize/crop for image queries "
                         "(image_host_parity=False, ~10x cheaper on a thin "
                         "host)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import _init_flagship
    from bioscan_clip_tpu.retrieval.service import RetrievalService

    rng = np.random.default_rng(0)
    model, params = _init_flagship()
    params = jax.device_put(params, jax.devices()[0])
    # float32 generation (no float64 transient: 5M x 768 is 15.4 GB, not
    # 31) and an aliased label-dict pool so the 5M-scale smoke doesn't
    # spend minutes constructing 5M distinct python dicts
    keys = rng.standard_normal((args.keys, 768), dtype=np.float32)
    pool = [
        {"order": "o", "family": "f", "genus": f"g{i % 100}",
         "species": f"s{i}"}
        for i in range(min(args.keys, 10_000))
    ]
    labels = [pool[i % len(pool)] for i in range(args.keys)]
    t0 = time.perf_counter()
    svc = RetrievalService(model, params, keys=keys, key_labels=labels,
                           max_k=5, max_batch=256,
                           key_precision=args.precision,
                           image_host_parity=not args.device_image)
    setup_s = time.perf_counter() - t0

    def barcodes(n, seed=0):
        r = np.random.default_rng(seed)
        return ["".join(r.choice(list("ACGT"), size=658))
                for _ in range(n)]

    out = {"n_keys": args.keys, "setup_s": round(setup_s, 1),
           "key_precision": args.precision,
           "image_host_parity": not args.device_image,
           "device": str(jax.devices()[0])}

    # single-query DNA search (compile + warm, then timed; p50 of 11)
    t0 = time.perf_counter()
    svc.search(dna=barcodes(1), k=5)
    out["dna_search_1_compile_s"] = round(time.perf_counter() - t0, 1)
    times = []
    for i in range(11):
        t0 = time.perf_counter()
        svc.search(dna=barcodes(1, seed=i + 1), k=5)
        times.append(time.perf_counter() - t0)
    times.sort()
    out["dna_search_1_ms"] = round(1000 * times[0], 1)
    out["dna_search_1_ms_p50"] = round(1000 * times[len(times) // 2], 1)

    # batch-64 image search
    imgs = [rng.integers(0, 256, size=(768, 512, 3)).astype(np.uint8)
            for _ in range(64)]
    t0 = time.perf_counter()
    svc.search(images=imgs, k=5)
    out["img_search_64_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    svc.search(images=imgs, k=5)
    out["img_search_64_ms"] = round(1000 * (time.perf_counter() - t0), 1)

    # batch-256 DNA embed throughput
    bars = barcodes(256, seed=9)
    svc.embed_dna(bars)  # warm the 256 bucket
    t0 = time.perf_counter()
    for _ in range(4):
        svc.embed_dna(bars)
    dt = (time.perf_counter() - t0) / 4
    out["dna_embed_256_ms"] = round(1000 * dt, 1)
    out["dna_embed_samples_per_s"] = round(256 / dt, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
