"""Cold-cache loader throughput: global permutation vs window shuffle
(VERDICT r4 #6 second half — measure what the shuffle strategy costs
against a file larger than the page-cache working set).

Evicts the fixture's pages with posix_fadvise(DONTNEED) before each timed
run (works unprivileged for clean pages), then iterates the REAL
BioscanLoader train path (native decode, aug, batch assembly) and reports
samples/s + the HDF5-read-only rate for the same index stream.

    python tools/bench_loader_coldcache.py --fixture /tmp/bscan_fixture/big_1m.hdf5 \
        [--windows 0,1024,16384] [--steps 30] [--batch 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def evict(path: str):
    """Drop this file's page-cache pages (clean pages, unprivileged)."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
    finally:
        os.close(fd)


def run_loader(fixture, split, batch, steps, window, read_only=False):
    from bioscan_clip_tpu.data.pipeline import BioscanLoader

    loader = BioscanLoader(
        fixture, split, batch_size=batch, for_training=True, shuffle=True,
        shuffle_window=window, train_crop=True, decode_threads=16,
    )
    if read_only:
        # HDF5 byte-read rate for the same index stream, no decode
        idx_iter = loader._index_batches()
        t0 = time.perf_counter()
        n = 0
        nbytes = 0
        for _ in range(steps):
            idx = next(idx_iter)
            bufs = loader.reader.read_images_bytes(idx)
            nbytes += sum(len(b) for b in bufs)
            n += len(idx)
        dur = time.perf_counter() - t0
        return {"samples_per_s": round(n / dur, 1),
                "read_mb_per_s": round(nbytes / dur / 1e6, 1)}
    it = iter(loader)
    next(it)  # spin-up (pools, native probe) — cache impact is tiny (1 batch)
    t0 = time.perf_counter()
    n = 0
    for _ in range(steps):
        b = next(it)
        key = "image_u8" if "image_u8" in b else "image"
        n += b[key].shape[0]
    dur = time.perf_counter() - t0
    it.close()
    return {"samples_per_s": round(n / dur, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default="/tmp/bscan_fixture/big_1m.hdf5")
    ap.add_argument("--split", default="no_split_and_seen_train")
    ap.add_argument("--batch", type=int, default=200)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--windows", default="0,1024,16384",
                    help="comma list; 0 = full global permutation")
    ap.add_argument("--out", default="BENCH_LOADER_COLD_r05.jsonl")
    ap.add_argument("--skip-read-only", action="store_true")
    args = ap.parse_args()

    size_gb = os.path.getsize(args.fixture) / 1e9
    for window in [int(w) for w in args.windows.split(",")]:
        for read_only in ([False] if args.skip_read_only else [True, False]):
            evict(args.fixture)
            row = {
                "mode": "loader_cold_read" if read_only else "loader_cold",
                "fixture_gb": round(size_gb, 1),
                "shuffle_window": window,
                "batch": args.batch,
                "steps": args.steps,
                **run_loader(args.fixture, args.split, args.batch,
                             args.steps, window, read_only=read_only),
            }
            line = json.dumps(row)
            print(line, flush=True)
            with open(args.out, "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
