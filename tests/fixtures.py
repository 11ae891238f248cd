"""Synthetic BIOSCAN-style HDF5 fixtures for end-to-end tests: tiny JPEG
images (distinct color per species), real COI-like barcodes, 4-level labels,
stub language tokens. Same schema as DATA.md."""

import io

import numpy as np
from PIL import Image

from bioscan_clip_tpu.data.hdf5 import write_split_hdf5

SPECIES_COLORS = [
    (220, 30, 30), (30, 220, 30), (30, 30, 220),
    (220, 220, 30), (30, 220, 220), (220, 30, 220),
]


def make_jpeg(color, size=(64, 48), seed=0):
    rng = np.random.default_rng(seed)
    arr = np.zeros((size[1], size[0], 3), np.uint8)
    arr[:] = color
    arr = np.clip(
        arr.astype(int) + rng.integers(-15, 15, arr.shape), 0, 255
    ).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def make_barcode(cls, rng):
    base = ["ACGT"[(cls * 7 + i * 3) % 4] for i in range(120)]
    # random mutations to keep per-sample variety
    for _ in range(5):
        base[rng.integers(0, 120)] = "ACGT"[rng.integers(0, 4)]
    return "".join(base)


def make_split_records(n_classes, per_class, seed=0):
    rng = np.random.default_rng(seed)
    images, barcodes = [], []
    order, family, genus, species = [], [], [], []
    for c in range(n_classes):
        for i in range(per_class):
            images.append(
                make_jpeg(SPECIES_COLORS[c % len(SPECIES_COLORS)],
                          seed=seed * 1000 + c * 100 + i)
            )
            barcodes.append(make_barcode(c, rng))
            order.append(f"order_{c % 2}")
            family.append(f"family_{c % 3}")
            genus.append(f"genus_{c}")
            species.append(f"species_{c}")
    return {
        "images": images,
        "barcode": barcodes,
        "order": order,
        "family": family,
        "genus": genus,
        "species": species,
    }


def build_synthetic_dataset(path, n_classes=4, per_class=6, seed=0):
    splits = {
        "no_split_and_seen_train": make_split_records(n_classes, per_class, seed),
        "val_seen": make_split_records(n_classes, 3, seed + 1),
        "val_unseen": make_split_records(n_classes, 3, seed + 2),
        "test_seen": make_split_records(n_classes, 2, seed + 3),
        "test_unseen": make_split_records(n_classes, 2, seed + 4),
        "train_seen": make_split_records(n_classes, 4, seed + 5),
        "seen_keys": make_split_records(n_classes, 3, seed + 6),
        "val_unseen_keys": make_split_records(n_classes, 2, seed + 7),
        "test_unseen_keys": make_split_records(n_classes, 2, seed + 8),
        "all_keys": make_split_records(n_classes, 4, seed + 9),
    }
    write_split_hdf5(path, splits, allow_stub_tokens=True)
    return path


class SyntheticArgs:
    """Minimal args object compatible with the dataloader factories."""

    def __init__(self, hdf5_path, batch_size=8, dataset="bioscan_1m",
                 modalities=("image", "dna", "language")):
        from bioscan_clip_tpu.config.core import ConfigNode

        mc = {
            "dataset": dataset,
            "batch_size": batch_size,
            "output_dim": 768,
            "epochs": 1,
            "evaluation_period": 1,
            "using_train_seen_for_pre_train": True,
            "model_output_name": "synthetic",
        }
        if "image" in modalities:
            mc["image"] = {"input_type": "image", "model": "lora_vit"}
        if "dna" in modalities:
            mc["dna"] = {"input_type": "sequence", "model": "lora_barcode_bert"}
        if "language" in modalities:
            mc["language"] = {"input_type": "sequence", "model": "lora_bert"}
        self.cfg = ConfigNode(
            {
                "model_config": mc,
                "bioscan_data": {"path_to_hdf5_data": str(hdf5_path)},
                "bioscan_5m_data": {"path_to_hdf5_data": str(hdf5_path)},
                "save_inference": False,
                "debug_flag": True,
            }
        )

    def __getattr__(self, k):
        return getattr(self.cfg, k)
