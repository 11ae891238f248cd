"""Build a ~1M-record BIOSCAN-shaped HDF5 at real byte density by cycling
the 63.5k realistic fixture's rows (VERDICT r4 #6: the loader was only ever
measured on a fixture that fits page cache; the 5M story needs a file
BIGGER than RAM-resident working sets, with the published ~65-70 KB/record
JPEG density).

Decode cost per record is identical to the realistic fixture (same JPEG
bytes); what this adds is FILE SCALE, so cold-cache read patterns (global
permutation vs window shuffle) measure disk behavior, not page-cache hits.

    python tools/make_big_fixture.py /tmp/bscan_fixture/big_1m.hdf5 \
        [--records 1000000] [--source /tmp/bscan_fixture/realistic_1m.hdf5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import h5py
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dest")
    ap.add_argument("--records", type=int, default=1_000_000)
    ap.add_argument("--source",
                    default="/tmp/bscan_fixture/realistic_1m.hdf5")
    ap.add_argument("--split", default="no_split_and_seen_train")
    ap.add_argument("--slab", type=int, default=10_000)
    args = ap.parse_args()

    t0 = time.time()
    src = h5py.File(args.source, "r")[args.split]
    n_src = src["image"].shape[0]
    n = args.records
    str_dt = h5py.string_dtype()

    with h5py.File(args.dest, "w") as f:
        g = f.create_group(args.split)
        for name in src:
            d = src[name]
            shape = (n,) + d.shape[1:]
            dt = str_dt if d.dtype == object else d.dtype
            g.create_dataset(name, shape=shape, dtype=dt)
        for s in range(0, n, args.slab):
            e = min(s + args.slab, n)
            # cycle source rows; contiguous source slices where possible
            lo = s % n_src
            take = e - s
            for name in src:
                d = src[name]
                if lo + take <= n_src:
                    block = d[lo : lo + take]
                else:
                    first = d[lo:]
                    rest_needed = take - first.shape[0]
                    reps = [first]
                    while rest_needed > 0:
                        t = min(rest_needed, n_src)
                        reps.append(d[:t])
                        rest_needed -= t
                    block = np.concatenate(reps, axis=0)
                g[name][s:e] = block
            if (s // args.slab) % 10 == 0:
                gb = g["image"].id.get_storage_size() / 1e9
                print(f"[{time.time()-t0:7.1f}s] {e}/{n} rows "
                      f"(~{gb:.1f} GB image)", file=sys.stderr, flush=True)

    import os

    size = os.path.getsize(args.dest)
    meta = {
        "path": args.dest,
        "records": n,
        "source": args.source,
        "file_gb": round(size / 1e9, 2),
        "build_s": round(time.time() - t0, 1),
    }
    with open(args.dest + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
