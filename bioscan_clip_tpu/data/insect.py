"""INSECT dataset (.mat-driven) — the zero-shot-transfer evaluation corpus.

Parity with bioscanclip/util/dataset_for_insect_dataset.py:64-267:
- `att_splits.mat` holds 1-BASED split index vectors (`train_loc`,
  `val_loc`, `test_seen_loc`, `test_unseen_loc`, `trainval_loc`);
  `res101.mat` holds `ids`, `nucleotides`, `species`;
- species -> {order, family, genus} comes from a JSON side table
  (`specie_to_other_labels.json`), missing levels -> 'not_classified';
- the label string is "order family genus species"
  (species_list_to_input_string_list) tokenized with BERT-small,
  padding='longest' across the whole split (tokenizer(..., padding=True));
- images live in a per-id HDF5 (`INSECT_images.hdf5`, group 'images');
- train transform adds ColorJitter(0.5,0.5,0.5,0.5) on top of the BIOSCAN
  augmentation (handled device-side, see data/transforms.py).

Unlike the reference's train path (which returns taxon-dict labels that the
contrastive loss cannot consume — a latent defect, SURVEY.md §4), training
batches here always carry instance labels (arange), the correct contrastive
semantics.
"""

from __future__ import annotations

import json
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

from bioscan_clip_tpu.data.pipeline import _decode_jpeg, _host_resize_shorter
from bioscan_clip_tpu.data.tokenizers import tokenize_dna_batch

LEVELS = ["order", "family", "genus"]


def species_list_to_input_string_list(species_list, species_to_others):
    out = []
    for sp in species_list:
        info = species_to_others.get(sp, {})
        parts = [info.get(level, "not_classified") for level in LEVELS]
        out.append(" ".join(parts) + " " + sp)
    return out


def species_list_to_labels(species_list, species_to_others):
    out = []
    for sp in species_list:
        info = species_to_others.get(sp, {})
        out.append(
            {
                "order": info.get("order", "not_classified"),
                "family": info.get("family", "not_classified"),
                "genus": info.get("genus", "not_classified"),
                "species": sp,
            }
        )
    return out


def load_insect_mat(path_to_att_splits_mat, path_to_res_101_mat, split):
    """Return (image_ids, barcodes, species) for one split ('all' = whole)."""
    import scipy.io as sio

    att = sio.loadmat(path_to_att_splits_mat)
    res = sio.loadmat(path_to_res_101_mat)
    image_ids = [x.item() for x in res["ids"].flatten()]
    barcodes = [x.item() for x in res["nucleotides"].flatten()]
    species = [x.item() for x in res["species"].flatten()]
    if split != "all":
        loc = att[split][0]
        image_ids = [image_ids[i - 1] for i in loc]  # 1-based indices
        barcodes = [barcodes[i - 1] for i in loc]
        species = [species[i - 1] for i in loc]
    return image_ids, barcodes, species


class InsectLoader:
    """Batch-dict loader over one INSECT split (same contract as
    BioscanLoader)."""

    def __init__(
        self,
        args,
        split: str,
        *,
        for_training: bool = False,
        cl_label: Optional[bool] = None,
        shuffle: bool = False,
        batch_size: Optional[int] = None,
        seed: int = 0,
        decode_threads: int = 16,
        prefetch_depth: int = 2,
        host_resize_to: int = 256,
        eval_parity: bool = True,
        openclip_norm: bool = False,
        process_index: int = 0,
        process_count: int = 1,
    ):
        ins = args.insect_data
        with open(ins.species_to_other) as f:
            self.species_to_others = json.load(f)
        self.image_ids, barcodes, self.species = load_insect_mat(
            ins.path_to_att_splits_mat, ins.path_to_res_101_mat, split
        )
        self.image_hdf5_path = ins.path_to_image_hdf5
        self.split = split
        self.batch_size = batch_size or args.model_config.batch_size
        self.for_training = for_training
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.prefetch_depth = prefetch_depth
        self.host_resize_to = host_resize_to
        # torchvision-exact host eval pipeline (see BioscanLoader): INSECT
        # images are variable-size, so this is also what keeps eval batches
        # distortion-free
        tpu_cfg = getattr(args, "tpu", None)
        if tpu_cfg is not None:
            eval_parity = bool(
                tpu_cfg.get("eval_host_parity_resize", eval_parity)
            )
        openclip_norm = openclip_norm or bool(
            getattr(args.model_config, "for_open_clip", False)
        )
        self.eval_parity = eval_parity and not for_training
        self.openclip_norm = openclip_norm
        self.process_index = process_index
        self.process_count = process_count
        self.n = len(self.image_ids)
        self._pool = ThreadPoolExecutor(max_workers=decode_threads)
        self._images_h5 = None

        self.dna_tokens = tokenize_dna_batch(barcodes)
        strings = species_list_to_input_string_list(
            self.species, self.species_to_others
        )
        self.language = self._tokenize_labels(strings)
        self.label_dicts = species_list_to_labels(
            self.species, self.species_to_others
        )
        # correct contrastive training labels (see module docstring)
        self.labels = np.arange(self.n, dtype=np.int64)

    @staticmethod
    def _tokenize_labels(strings):
        from bioscan_clip_tpu.data.tokenizers import (
            tokenize_labels_bert_small,
        )

        try:
            # reference tokenizes padding='longest'
            # (dataset_for_insect_dataset.py:90); 4-level strings fit in 20
            import os

            from transformers import AutoTokenizer

            allow = os.environ.get("BIOSCAN_CLIP_TPU_ALLOW_DOWNLOAD") == "1"
            tok = AutoTokenizer.from_pretrained(
                "prajjwal1/bert-small", local_files_only=not allow
            )
            enc = tok(strings, padding=True, return_tensors="np")
            return {
                "input_ids": enc["input_ids"].astype(np.int32),
                "token_type_ids": enc["token_type_ids"].astype(np.int32),
                "attention_mask": enc["attention_mask"].astype(np.int32),
            }
        except Exception:
            h = np.array(
                [
                    [abs(hash(s + str(j))) % 30000 for j in range(20)]
                    for s in strings
                ],
                dtype=np.int32,
            )
            return {
                "input_ids": h,
                "token_type_ids": np.zeros_like(h),
                "attention_mask": np.ones_like(h),
            }

    def _open_images(self):
        if self._images_h5 is None:
            import h5py

            self._images_h5 = h5py.File(self.image_hdf5_path, "r")["images"]
        return self._images_h5

    def __len__(self):
        n = self.n // self.process_count if self.for_training else self.n
        if self.for_training:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self):
        idx = np.arange(self.n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + self.epoch).permutation(idx)
        if self.process_count > 1 and self.for_training:
            # multi-host: process-strided shard of every epoch permutation
            # (DistributedSampler semantics — matches data/pipeline.py)
            idx = idx[self.process_index :: self.process_count]
        bs = self.batch_size
        n_full = len(idx) // bs
        for b in range(n_full):
            yield idx[b * bs : (b + 1) * bs]
        if not self.for_training and n_full * bs < len(idx):
            yield idx[n_full * bs :]

    def _make_batch(self, idx):
        g = self._open_images()

        if self.eval_parity:
            from bioscan_clip_tpu.data.transforms import host_eval_image

            def load_one(i):
                buf = bytes(np.asarray(g[self.image_ids[i]]).tobytes())
                return host_eval_image(
                    _decode_jpeg(buf), normalize=self.openclip_norm
                )

            image_key, image = "image", np.stack(
                list(self._pool.map(load_one, idx.tolist()))
            )
        else:
            def load_one(i):
                buf = bytes(np.asarray(g[self.image_ids[i]]).tobytes())
                im = _decode_jpeg(buf)
                if self.host_resize_to:
                    im = _host_resize_shorter(im, self.host_resize_to)
                return im

            imgs = list(self._pool.map(load_one, idx.tolist()))
            shapes = {im.shape for im in imgs}
            if len(shapes) > 1:
                import cv2

                h0, w0 = imgs[0].shape[:2]
                imgs = [
                    im if im.shape[:2] == (h0, w0)
                    else cv2.resize(im, (w0, h0))
                    for im in imgs
                ]
            image_key, image = "image_u8", np.stack(imgs).astype(np.uint8)
        batch = {
            image_key: image,
            "dna": self.dna_tokens[idx],
            "language": {k: v[idx] for k, v in self.language.items()},
        }
        if self.for_training:
            batch["labels"] = self.labels[idx]
        else:
            batch["label_dicts"] = [self.label_dicts[i] for i in idx]
            batch["ids"] = [self.image_ids[i] for i in idx]
        return batch

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_depth)
        stop = object()

        def producer():
            try:
                for idx in self._index_batches():
                    q.put(self._make_batch(idx))
            except BaseException as e:
                q.put(e)
            finally:
                q.put(stop)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        if self.for_training:
            self.epoch += 1


def load_insect_dataloader(
    args, world_size=None, rank=None, num_workers=8, load_all_in_one=False,
    shuffle_for_train_seen_key=False, process_index: int = 0,
    process_count: int = 1,
):
    """(train, train_for_key, val, test_seen, test_unseen) or the all-in-one
    loader (dataset_for_insect_dataset.py:193-267). Multi-host: only the
    TRAIN loader is process-sharded (eval reads full splits everywhere)."""
    if load_all_in_one:
        return InsectLoader(args, "all")
    train = InsectLoader(
        args, "train_loc", for_training=True, shuffle=True,
        process_index=process_index, process_count=process_count,
    )
    train_for_key = InsectLoader(
        args, "train_loc", shuffle=shuffle_for_train_seen_key
    )
    val = InsectLoader(args, "val_loc")
    test_seen = InsectLoader(args, "test_seen_loc")
    test_unseen = InsectLoader(args, "test_unseen_loc")
    return train, train_for_key, val, test_seen, test_unseen


def load_insect_dataloader_trainval(args, num_workers=8,
                                    shuffle_for_train_seen_key=False):
    return InsectLoader(
        args, "trainval_loc", for_training=True, shuffle=True
    )
