"""HDF5 split-file reader/writer for the BIOSCAN-1M/5M export schema.

Schema (reference DATA.md:1-110, generate_hdf5_file_5m.py): per-split groups
(`all_keys`, `val_seen`, `val_unseen`, `test_seen`, `test_unseen`,
`seen_keys`, `unseen_keys`/`val_unseen_keys`/`test_unseen_keys`,
`no_split`, `no_split_and_seen_train`, `train_seen`) each containing
`image` (padded JPEG byte rows) + `image_mask` (byte lengths), `barcode`,
`order/family/genus/species`, `sampleid`, `processid` (5M) / `image_file`
(1M), and pre-tokenized `language_tokens_{input_ids,token_type_ids,
attention_mask}`.

The reader does *chunked sequential* reads (sorted index batches) — HDF5
random row access is the reference's data-path bottleneck at scale.
"""

from __future__ import annotations

from typing import Optional

import h5py
import numpy as np

from bioscan_clip_tpu.data.tokenizers import (
    build_label_strings,
    tokenize_dna_batch,
)

LEVELS = ["order", "family", "genus", "species"]


def get_len_dict(args) -> dict:
    """Split name -> record count (reference dataset.py:278-288)."""
    path = hdf5_path_for(args)
    out = {}
    with h5py.File(path, "r") as f:
        for split in f.keys():
            out[split] = len(f[split]["image"])
    return out


def hdf5_path_for(args) -> str:
    mc = args.model_config
    if getattr(mc, "dataset", None) == "bioscan_5m":
        return args.bioscan_5m_data.path_to_hdf5_data
    return args.bioscan_data.path_to_hdf5_data


class SplitReader:
    """Random-access reader over one split group with batch (sorted-index)
    fancy reads. h5py requires increasing indices for fancy indexing; we
    sort + invert the permutation, which also makes the disk access pattern
    sequential."""

    def __init__(self, path: str, split: str):
        self.path = path
        self.split = split
        self._group = None

    @property
    def group(self):
        if self._group is None:  # lazy per-process open (dataset.py:216-217)
            self._group = h5py.File(self.path, "r", libver="latest")[self.split]
        return self._group

    def __len__(self):
        return len(self.group["image"])

    def _take(self, name, idx):
        ds = self.group[name]
        idx = np.asarray(idx)
        order = np.argsort(idx, kind="stable")
        sorted_idx = idx[order]
        # h5py fancy indexing needs strictly increasing unique indices
        uniq, inv = np.unique(sorted_idx, return_inverse=True)
        data = ds[uniq]
        out = data[inv]
        unsort = np.empty_like(order)
        unsort[order] = np.arange(len(order))
        return out[unsort]

    def read_images_bytes(self, idx) -> list:
        """Return list of raw JPEG byte strings for the given rows."""
        enc = self._take("image", idx)
        mask = self._take("image_mask", idx)
        return [bytes(e[:m].tobytes()) for e, m in zip(enc, mask)]

    def read_barcodes(self, idx) -> list:
        return [b for b in self._take("barcode", idx)]

    def read_dna_tokens(self, idx) -> np.ndarray:
        return tokenize_dna_batch(self.read_barcodes(idx))

    def read_language_tokens(self, idx) -> dict:
        return {
            "input_ids": self._take("language_tokens_input_ids", idx).astype(
                np.int32
            ),
            "token_type_ids": self._take(
                "language_tokens_token_type_ids", idx
            ).astype(np.int32),
            "attention_mask": self._take(
                "language_tokens_attention_mask", idx
            ).astype(np.int32),
        }

    def read_label_dicts(self, idx=None) -> list:
        g = self.group
        if idx is None:
            cols = {lvl: g[lvl][:] for lvl in LEVELS}
        else:
            cols = {lvl: self._take(lvl, idx) for lvl in LEVELS}

        def dec(x):
            return x.decode("utf-8") if isinstance(x, bytes) else str(x)

        n = len(next(iter(cols.values())))
        return [
            {lvl: dec(cols[lvl][i]) for lvl in LEVELS} for i in range(n)
        ]

    def read_ids(self, idx) -> list:
        name = "processid" if "processid" in self.group else "image_file"
        return [
            x.decode("utf-8") if isinstance(x, bytes) else str(x)
            for x in self._take(name, idx)
        ]


def write_split_hdf5(
    path: str,
    splits: dict,
    max_image_bytes: Optional[int] = None,
    tokenize_language: bool = True,
    dataset_flavor: str = "bioscan_1m",
    allow_stub_tokens: bool = False,
    vocab_path: Optional[str] = None,
):
    """Write a schema-compatible split HDF5 (used for synthetic fixtures and
    as the core of the dataset builder; mirrors generate_hdf5_file_5m.py).

    splits: {split_name: {"images": [jpeg bytes...], "barcode": [str...],
             "order"/"family"/"genus"/"species": [str...],
             optional "sampleid"/"processid"/"image_file": [str...],
             optional "language_tokens": dict}}.
    """
    with h5py.File(path, "w") as f:
        for split, rec in splits.items():
            g = f.create_group(split)
            imgs = rec["images"]
            n = len(imgs)
            maxlen = max_image_bytes or max((len(b) for b in imgs), default=1)
            arr = np.zeros((n, maxlen), dtype=np.uint8)
            mask = np.zeros((n,), dtype=np.int64)
            for i, b in enumerate(imgs):
                bb = np.frombuffer(b, dtype=np.uint8)
                arr[i, : len(bb)] = bb
                mask[i] = len(bb)
            g.create_dataset("image", data=arr)
            g.create_dataset("image_mask", data=mask)

            str_dt = h5py.string_dtype()
            g.create_dataset(
                "barcode", data=np.array(rec["barcode"], dtype=object),
                dtype=str_dt,
            )
            for lvl in LEVELS:
                g.create_dataset(
                    lvl, data=np.array(rec[lvl], dtype=object), dtype=str_dt
                )
            ids = rec.get("sampleid", [f"sample_{i}" for i in range(n)])
            g.create_dataset(
                "sampleid", data=np.array(ids, dtype=object), dtype=str_dt
            )
            if dataset_flavor == "bioscan_5m":
                pids = rec.get("processid", [f"proc_{i}" for i in range(n)])
                g.create_dataset(
                    "processid", data=np.array(pids, dtype=object),
                    dtype=str_dt,
                )
            else:
                files = rec.get(
                    "image_file", [f"img_{i}.jpg" for i in range(n)]
                )
                g.create_dataset(
                    "image_file", data=np.array(files, dtype=object),
                    dtype=str_dt,
                )

            lt = rec.get("language_tokens")
            if lt is None and tokenize_language:
                strings = build_label_strings(
                    rec["order"], rec["family"], rec["genus"], rec["species"]
                )
                try:
                    from bioscan_clip_tpu.data.tokenizers import (
                        tokenize_labels_bert_small,
                    )

                    lt = tokenize_labels_bert_small(
                        strings, vocab_path=vocab_path
                    )
                except Exception as e:
                    if not allow_stub_tokens:
                        raise RuntimeError(
                            "write_split_hdf5: no BERT-small tokenizer "
                            "available (no cached HF tokenizer and no "
                            "vocab_path/$BSCAN_BERT_VOCAB for the native "
                            "WordPiece). Refusing to write FAKE language "
                            "tokens into a data artifact; pass "
                            "allow_stub_tokens=True (tests only) or supply "
                            "a vocab.txt."
                        ) from e
                    # test fixtures only: deterministic stub tokens
                    h = np.array(
                        [
                            [abs(hash(s + str(j))) % 30000 for j in range(20)]
                            for s in strings
                        ],
                        dtype=np.int32,
                    )
                    lt = {
                        "input_ids": h,
                        "token_type_ids": np.zeros_like(h),
                        "attention_mask": np.ones_like(h),
                    }
            if lt is not None:
                for k, v in lt.items():
                    g.create_dataset(f"language_tokens_{k}", data=v)
