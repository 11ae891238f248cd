"""Build a realistic BIOSCAN-shaped HDF5 fixture for end-to-end on-chip
benchmarks (VERDICT r3 next-step #1): ~60k records with real JPEG bytes at
768x512 (the BIOSCAN-1M camera geometry, ~65 KB/record like the published
79.7 GB / 1M ratio), 658-nt COI-like barcode strings, 4-level taxonomy and
stub language tokens — the exact schema DATA.md describes and
data/hdf5.py:write_split_hdf5 emits.

The image content is synthetic (per-species color/texture pattern + blob +
per-sample sensor noise) but decode-realistic: JPEG entropy, dimensions and
byte sizes match the real corpus, so host JPEG-decode cost — the quantity
the pipeline-fed benchmark exists to measure — is representative.

    python tools/make_realistic_fixture.py [out.hdf5] [--train N]

Defaults: /tmp/bscan_fixture/realistic_1m.hdf5, train split 50k.
~35 min on one core (JPEG encode bound); the result is reusable across runs.
"""

import io
import json
import os
import sys
import time

import numpy as np
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bioscan_clip_tpu.data.hdf5 import write_split_hdf5  # noqa: E402

H, W = 512, 768
N_SPECIES = 200  # 200 species over 50 genera / 20 families / 8 orders
QUALITY = 85


def _species_pattern(cls: int) -> np.ndarray:
    """Deterministic per-species base image: smooth background + an
    elliptical 'specimen' blob with species-specific hue/shape."""
    rng = np.random.default_rng(1000 + cls)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    fx, fy = rng.uniform(60, 140, 2)
    base = 130 + 50 * np.sin(xx / fx + rng.uniform(0, 6)) \
        + 35 * np.cos(yy / fy + rng.uniform(0, 6))
    color = rng.uniform(0.6, 1.0, 3).astype(np.float32)
    img = base[..., None] * color[None, None, :]
    # specimen blob in the center-ish region
    cy, cx = rng.uniform(0.35, 0.65) * H, rng.uniform(0.35, 0.65) * W
    ry, rx = rng.uniform(0.10, 0.22) * H, rng.uniform(0.10, 0.25) * W
    blob = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) < 1.0
    blob_color = rng.uniform(20, 235, 3).astype(np.float32)
    img = np.where(blob[..., None], 0.35 * img + 0.65 * blob_color, img)
    return img.astype(np.float32)


_COI = "ACGT"


def _species_barcode(cls: int) -> list:
    rng = np.random.default_rng(2000 + cls)
    return [_COI[i] for i in rng.integers(0, 4, 658)]


def make_record_batch(cls: int, n: int, seed: int, pattern, proto):
    """n JPEG byte strings + barcodes for one species."""
    rng = np.random.default_rng(seed)
    images, barcodes = [], []
    for _ in range(n):
        noise = rng.integers(-12, 13, (H, W, 3)).astype(np.float32)
        # small translation keeps samples distinct beyond the noise
        arr = np.roll(pattern, (rng.integers(-20, 20), rng.integers(-30, 30)),
                      axis=(0, 1))
        arr = np.clip(arr + noise, 0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=QUALITY)
        images.append(buf.getvalue())
        bc = list(proto)
        for _ in range(8):  # ~1.2% within-species mutation
            bc[rng.integers(0, 658)] = _COI[rng.integers(0, 4)]
        barcodes.append("".join(bc))
    return images, barcodes


def make_split(n: int, seed: int, species: np.ndarray, patterns, protos):
    """A split with n records spread over the given species ids."""
    rng = np.random.default_rng(seed)
    counts = np.bincount(
        rng.choice(species, size=n), minlength=N_SPECIES
    )
    rec = {k: [] for k in
           ("images", "barcode", "order", "family", "genus", "species")}
    for cls in range(N_SPECIES):
        c = int(counts[cls])
        if c == 0:
            continue
        imgs, bcs = make_record_batch(
            cls, c, seed * 100003 + cls, patterns[cls], protos[cls]
        )
        rec["images"] += imgs
        rec["barcode"] += bcs
        rec["order"] += [f"order_{cls % 8}"] * c
        rec["family"] += [f"family_{cls % 20}"] * c
        rec["genus"] += [f"genus_{cls % 50}"] * c
        rec["species"] += [f"species_{cls}"] * c
    return rec


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
        "--") else "/tmp/bscan_fixture/realistic_1m.hdf5"
    n_train = (
        int(sys.argv[sys.argv.index("--train") + 1])
        if "--train" in sys.argv else 50_000
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    seen = np.arange(0, 160)       # species 0-159 seen
    unseen = np.arange(160, 200)   # species 160-199 unseen
    t0 = time.time()
    print(f"rendering {N_SPECIES} species patterns ...", flush=True)
    patterns = [_species_pattern(c) for c in range(N_SPECIES)]
    protos = [_species_barcode(c) for c in range(N_SPECIES)]

    plan = [
        ("no_split_and_seen_train", n_train, 11, seen),
        ("train_seen", 2000, 12, seen),
        ("all_keys", 4000, 13, np.arange(N_SPECIES)),
        ("seen_keys", 1000, 14, seen),
        ("val_seen", 2000, 15, seen),
        ("val_unseen", 1500, 16, unseen),
        ("test_seen", 1000, 17, seen),
        ("test_unseen", 1000, 18, unseen),
        ("val_unseen_keys", 500, 19, unseen),
        ("test_unseen_keys", 500, 20, unseen),
    ]
    splits = {}
    total = 0
    for name, n, seed, sp in plan:
        t = time.time()
        splits[name] = make_split(n, seed, sp, patterns, protos)
        total += n
        print(f"  {name}: {n} records in {time.time()-t:.0f}s", flush=True)
    print(f"writing {out_path} ({total} records) ...", flush=True)
    write_split_hdf5(out_path, splits, allow_stub_tokens=True)
    sz = os.path.getsize(out_path) / 1e9
    meta = {
        "path": out_path, "records": total, "train": n_train,
        "species": N_SPECIES, "image_hw": [H, W], "jpeg_quality": QUALITY,
        "file_gb": round(sz, 2), "build_s": round(time.time() - t0, 1),
    }
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
