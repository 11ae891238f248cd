"""Dataloader factories — reference-compatible entry points.

Mirrors bioscanclip/util/dataset.py:371-711: same function names, same split
wiring, same return orders, yielding TPU batch dicts instead of torch
7-tuples. BIN-URI positive-pair labels (dataset.py:142-145) are supported
via `bin_for_positive_and_negative_pairs`.
"""

from __future__ import annotations

import numpy as np

from bioscan_clip_tpu.data.hdf5 import get_len_dict, hdf5_path_for
from bioscan_clip_tpu.data.pipeline import BioscanLoader


def get_bin_labels(split: str, hdf5_path: str, tsv_path: str) -> np.ndarray:
    """BIN-URI group ids for positive-pair mining (dataset.py:75-94):
    filter the metadata TSV to the split's sampleids, map each record's
    `uri` to a dense int id in first-appearance order."""
    import h5py
    import pandas as pd

    with h5py.File(hdf5_path, "r") as f:
        sample_ids = [s.decode("utf-8") for s in f[split]["sampleid"][:]]
    df = pd.read_csv(tsv_path, sep="\t")
    filtered = df[df["sampleid"].isin(sample_ids)]
    uris = filtered["uri"].tolist()
    mapping: dict = {}
    out = []
    for u in uris:
        if u not in mapping:
            mapping[u] = len(mapping)
        out.append(mapping[u])
    return np.asarray(out, dtype=np.int64)


def _modalities(args):
    mc = args.model_config
    with_image = hasattr(mc, "image") and getattr(
        mc.image, "input_type", "image"
    ) == "image"
    with_dna = hasattr(mc, "dna")
    with_language = True  # language tokens are always read (dataset.py:374)
    return with_image, with_dna, with_language


def construct_dataloader(
    args,
    split: str,
    *,
    for_pre_train: bool = False,
    shuffle: bool = False,
    labels=None,
    process_index: int = 0,
    process_count: int = 1,
) -> BioscanLoader:
    """One split -> loader (reference construct_dataloader, dataset.py:291-368)."""
    mc = args.model_config
    with_image, with_dna, with_language = _modalities(args)
    path = hdf5_path_for(args)

    if (
        for_pre_train
        and labels is None
        and getattr(mc, "bin_for_positive_and_negative_pairs", False)
    ):
        labels = get_bin_labels(
            split, path, args.bioscan_data.path_to_tsv_data
        )

    tpu_cfg = getattr(args, "tpu", None)
    eval_parity = bool(tpu_cfg.get("eval_host_parity_resize", True)) \
        if tpu_cfg else True
    return BioscanLoader(
        path,
        split,
        batch_size=mc.batch_size,
        with_image=with_image,
        with_dna=with_dna,
        with_language=with_language,
        for_training=for_pre_train,
        shuffle=shuffle,
        labels=labels,
        decode_threads=getattr(mc, "num_workers", 8) * 2,
        eval_parity=eval_parity,
        openclip_norm=bool(getattr(mc, "for_open_clip", False)),
        process_index=process_index,
        process_count=process_count,
        # tpu.train_crop: host-side RandomResizedCrop for train batches
        # (halves device image bytes; see pipeline.py)
        train_crop=bool(tpu_cfg.get("train_crop", False)) if tpu_cfg else False,
        # tpu.eval_host_crop: host-side CenterCrop(224) for the fast
        # (non-parity) eval path — bit-identical pixels, ~2x fewer feed
        # bytes; no effect when eval_host_parity_resize is on
        eval_host_crop=bool(tpu_cfg.get("eval_host_crop", True))
        if tpu_cfg else False,
        # tpu.shuffle_window: train-shuffle locality window (see
        # pipeline.py — 0 = full global permutation)
        shuffle_window=int(tpu_cfg.get("shuffle_window", 0))
        if tpu_cfg else 0,
    )


def load_dataloader(args, world_size=None, rank=None, for_pretrain=True,
                    process_index: int = 0, process_count: int = 1):
    """(pre_train, val_seen, val_unseen, all_keys) — dataset.py:460-546.

    Multi-host: only the TRAIN loader is process-sharded
    (DistributedSampler semantics); eval loaders read the full split on
    every process — eval stays single-controller-correct like the
    reference's rank-0 eval."""
    mc = args.model_config
    mk = lambda split, **kw: construct_dataloader(args, split, **kw)
    seen_val = mk("val_seen")
    unseen_val = mk("val_unseen")
    all_keys = mk("all_keys")
    train_kw = dict(
        process_index=process_index, process_count=process_count,
        shuffle=True,
    )
    if for_pretrain:
        split = (
            "no_split_and_seen_train"
            if getattr(mc, "using_train_seen_for_pre_train", False)
            else "no_split"
        )
        pre_train = mk(split, for_pre_train=True, **train_kw)
        return pre_train, seen_val, unseen_val, all_keys
    train_seen = mk("train_seen", **train_kw)
    return train_seen, seen_val, unseen_val, all_keys


def load_bioscan_dataloader_all_small_splits(args, world_size=None, rank=None):
    """9 loaders over every eval split with the 1M/5M split-name mapping
    (dataset.py:549-711)."""
    mc = args.model_config
    is_5m = getattr(mc, "dataset", None) == "bioscan_5m"
    mk = lambda split: construct_dataloader(args, split)

    train_seen = mk("seen_keys" if is_5m else "train_seen")
    seen_val = mk("val_seen")
    unseen_val = mk("val_unseen")
    seen_test = mk("test_seen")
    unseen_test = mk("test_unseen")
    seen_keys = mk("seen_keys")
    if is_5m:
        val_unseen_keys = mk("unseen_keys")
        test_unseen_keys = mk("unseen_keys")
    else:
        val_unseen_keys = mk("val_unseen_keys")
        test_unseen_keys = mk("test_unseen_keys")
    all_keys = mk("all_keys")
    return (
        train_seen,
        seen_val,
        unseen_val,
        seen_test,
        unseen_test,
        seen_keys,
        val_unseen_keys,
        test_unseen_keys,
        all_keys,
    )


def load_bioscan_dataloader_with_train_seen_and_separate_keys(
    args, world_size=None, rank=None, for_pretrain=True
):
    """(train_seen, val_seen, val_unseen, seen_keys, val_unseen_keys,
    test_unseen_keys) — dataset.py:371-457."""
    mk = lambda split, **kw: construct_dataloader(args, split, **kw)
    return (
        mk("train_seen", shuffle=True),
        mk("val_seen"),
        mk("val_unseen"),
        mk("seen_keys"),
        mk("val_unseen_keys"),
        mk("test_unseen_keys"),
    )
