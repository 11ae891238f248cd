"""Host->device streaming data pipeline.

Replaces the reference's torch DataLoader + per-sample PIL/torchvision CPU
workers (dataset.py:97-368) with a TPU-shaped pipeline:

- chunked sequential HDF5 reads (sorted-index batch gets),
- *streamed* DNA tokenization (vectorized per batch) — the reference
  tokenizes the entire split eagerly at dataloader construction
  (dataset.py:318-326), an O(split) startup stall this design removes,
- threaded JPEG decode to uint8 on the host (decode is the only stage that
  cannot run on TPU),
- a background prefetch thread keeping `prefetch_depth` batches ready,
- augmentation runs on DEVICE (data/transforms.py) fused into the train
  step, so the host ships raw uint8 pixels only.

Multi-host: each JAX process reads its `process_index`-strided shard of
every batch (DistributedSampler(drop_last=True) semantics, dataset.py:41-48).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

from bioscan_clip_tpu.data.hdf5 import SplitReader


def _decode_jpeg(buf: bytes) -> np.ndarray:
    try:
        import cv2

        arr = cv2.imdecode(
            np.frombuffer(buf, dtype=np.uint8), cv2.IMREAD_COLOR
        )
        return arr[:, :, ::-1]  # BGR -> RGB
    except Exception:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))


def _host_resize_shorter(img: np.ndarray, size: int) -> np.ndarray:
    """Shorter-side resize on host (cv2 bilinear), used only to unify shapes
    before batching; the filter-accurate resize happens on device."""
    import cv2

    h, w = img.shape[:2]
    if min(h, w) == size:
        return img
    if h <= w:
        nh, nw = size, max(1, int(round(size * w / h)))
    else:
        nh, nw = max(1, int(round(size * h / w))), size
    interp = cv2.INTER_AREA if nh < h else cv2.INTER_LINEAR
    return cv2.resize(img, (nw, nh), interpolation=interp)


def _fit_to_slot(im: np.ndarray, h0: int, w0: int) -> np.ndarray:
    """Fit (h, w, 3) into a fixed (h0, w0) slot: center crop if larger,
    edge-replicate pad if smaller — byte-identical geometry to the native
    decoder's place_center (native/bscan_io.cc)."""
    h, w = im.shape[:2]
    if h > h0:
        top = (h - h0) // 2
        im = im[top : top + h0]
    if w > w0:
        left = (w - w0) // 2
        im = im[:, left : left + w0]
    h, w = im.shape[:2]
    if h < h0 or w < w0:
        pt = (h0 - h) // 2
        pl = (w0 - w) // 2
        im = np.pad(
            im, ((pt, h0 - h - pt), (pl, w0 - w - pl), (0, 0)), mode="edge"
        )
    return im


class BioscanLoader:
    """Iterable over batch dicts for one split.

    Batch dict keys (modalities follow model_config):
      image_u8: (B, H, W, 3) uint8 — raw pixels, device transforms apply
      dna:      (B, 133) int32 k-mer tokens
      language: {input_ids, token_type_ids, attention_mask} (B, 20) int32
      labels:   (B,) int64 instance/BIN ids (training) — absent for eval
      label_dicts: host list of 4-level dicts (eval)
      ids:      host list of processid/image_file strings
    """

    def __init__(
        self,
        hdf5_path: str,
        split: str,
        batch_size: int,
        *,
        with_image: bool = True,
        with_dna: bool = True,
        with_language: bool = True,
        for_training: bool = False,
        shuffle: bool = False,
        drop_last: Optional[bool] = None,
        labels: Optional[np.ndarray] = None,
        seed: int = 0,
        decode_threads: int = 16,
        prefetch_depth: int = 2,
        host_resize_to: int = 256,
        eval_parity: bool = True,
        eval_host_crop: bool = False,
        eval_crop_size: int = 224,
        openclip_norm: bool = False,
        process_index: int = 0,
        process_count: int = 1,
        train_crop: bool = False,
        train_crop_size: int = 224,
        shuffle_window: int = 0,
    ):
        self.reader = SplitReader(hdf5_path, split)
        self.split = split
        self.batch_size = batch_size
        self.with_image = with_image
        self.with_dna = with_dna
        self.with_language = with_language
        self.for_training = for_training
        self.shuffle = shuffle
        # 0 = full global permutation (pure random row access — fine while
        # the split fits page cache, pathological against a 190 GB HDF5 on
        # disk, SURVEY §7 hard part 5). >0 = window shuffle: rows shuffle
        # WITHIN contiguous windows of this many records and the window
        # order shuffles — every read stays inside one ~window span of the
        # file (HDF5-chunk/page-cache-local), at the cost of mixing only
        # within windows each epoch (shuffle quality scales with window
        # size; the reference's DataLoader full shuffle is window = split).
        self.shuffle_window = int(shuffle_window)
        self.drop_last = for_training if drop_last is None else drop_last
        self.seed = seed
        self.epoch = 0
        self.decode_threads = decode_threads
        self.prefetch_depth = prefetch_depth
        self.host_resize_to = host_resize_to
        # eval splits default to the torchvision-EXACT host pipeline
        # (decode full-res -> float triangle resize -> center crop), so the
        # checkpoint-parity path is the default path and variable-size
        # sources can't distort (reference dataset.py:194-200)
        self.eval_parity = eval_parity and not for_training
        # host-side CenterCrop(224) for the fast (non-parity) EVAL path:
        # the crop of the shorter-side-256 u8 frame is an exact slice with
        # the same floor-div geometry as transforms.center_crop, so the
        # device sees bit-identical pixels while host->device ships ~2x
        # fewer bytes. Consumers check `eval_pre_cropped` and pass
        # pre_cropped=True to eval_transform (extract_features does this
        # automatically).
        self.eval_pre_cropped = (
            eval_host_crop and with_image
            and not for_training and not self.eval_parity
        )
        self.eval_crop_size = eval_crop_size
        self.openclip_norm = openclip_norm
        # host-side Resize(256)+RandomResizedCrop(224) for the TRAIN path:
        # ships (224, 224, 3) uint8 per sample (~2x fewer bytes than the
        # shorter-side-256 frame) so K-steps-per-dispatch stacked batches fit
        # twice the K in HBM (PERF_NOTES.md round 2 memory ceiling). The
        # device train_transform then skips its crop stage (pre_cropped).
        self.train_crop = train_crop and for_training
        self.train_crop_size = train_crop_size
        self.process_index = process_index
        self.process_count = process_count
        self.n = len(self.reader)
        # instance labels for contrastive training (dataset.py:147) unless
        # BIN labels were passed in
        self.labels = labels
        if for_training and labels is None:
            self.labels = np.arange(self.n, dtype=np.int64)
        self._pool = ThreadPoolExecutor(max_workers=decode_threads)
        # native decode pool (C++/libjpeg) when built; falls back to the
        # cv2/PIL thread pool otherwise
        self._native_hw = None
        self._use_native = False
        if with_image and host_resize_to:
            try:
                from bioscan_clip_tpu.data import native_io

                self._use_native = native_io.available()
            except Exception:
                self._use_native = False

    def __len__(self):
        per_proc = self.n // self.process_count if self.drop_last else self.n
        if self.drop_last:
            return per_proc // self.batch_size
        return -(-self.n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _index_batches(self):
        idx = np.arange(self.n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            w = self.shuffle_window
            if w and w < self.n:
                # window shuffle: permute rows within each contiguous
                # window, then permute the window order (sequential-local
                # disk access at 1/w of full-shuffle randomness)
                n_win = -(-self.n // w)
                order = rng.permutation(n_win)
                parts = []
                for win in order:
                    lo = win * w
                    hi = min(lo + w, self.n)
                    parts.append(lo + rng.permutation(hi - lo))
                idx = np.concatenate(parts)
            else:
                idx = rng.permutation(idx)
        if self.process_count > 1:
            idx = idx[self.process_index :: self.process_count]
        bs = self.batch_size
        n_full = len(idx) // bs
        for b in range(n_full):
            yield idx[b * bs : (b + 1) * bs]
        if not self.drop_last and n_full * bs < len(idx):
            yield idx[n_full * bs :]

    def _native_out_hw(self, first_buf) -> tuple:
        """Fixed output slot for the native decoder: the shorter-side-resized
        dims of the first image (BIOSCAN images share one aspect ratio, so
        this keeps every pixel; odd aspect outliers get edge-padded)."""
        if self._native_hw is None:
            im = _decode_jpeg(first_buf)
            h, w = im.shape[:2]
            s = self.host_resize_to
            # the native path's edge (libjpeg DCT scaling, no full-res
            # decode) only exists when downscaling; tiny sources upscale
            # faster through SIMD cv2
            if min(h, w) < s:
                self._use_native = False
            if h <= w:
                self._native_hw = (s, max(1, int(round(s * w / h))))
            else:
                self._native_hw = (max(1, int(round(s * h / w))), s)
        return self._native_hw

    def _make_batch(self, idx) -> dict:
        batch = {}
        if self.with_image and self.eval_parity:
            from bioscan_clip_tpu.data.transforms import host_eval_image

            bufs = self.reader.read_images_bytes(idx)
            imgs = list(self._pool.map(_decode_jpeg, bufs))
            batch["image"] = np.stack(
                list(
                    self._pool.map(
                        lambda im: host_eval_image(
                            im, normalize=self.openclip_norm
                        ),
                        imgs,
                    )
                )
            )
        if self.with_image and self.train_crop and "image" not in batch:
            from bioscan_clip_tpu.data.transforms import host_train_augment

            bufs = self.reader.read_images_bytes(idx)
            # decode through the native DCT-scaled pool when available:
            # host_random_resized_crop skips its Resize(256) on an input
            # that is already shorter-side-256 — the SAME image the
            # device-aug path consumes (identical fidelity), and ~4x less
            # host work than full-res python decode + cv2 downscale
            # (measured 10.6 -> ~2.7 ms/image on the realistic fixture)
            imgs = None
            if self._use_native:
                from bioscan_clip_tpu.data import native_io

                out_h, out_w = self._native_out_hw(bufs[0])
                if self._use_native:  # probe may have demoted
                    try:
                        imgs = list(
                            native_io.decode_batch(
                                bufs, target_short=self.host_resize_to,
                                out_h=out_h, out_w=out_w,
                                threads=self.decode_threads,
                            )
                        )
                    except ValueError:
                        self._use_native = False
            if imgs is None:
                imgs = list(self._pool.map(_decode_jpeg, bufs))
            # independent per-image streams, deterministic in
            # (seed, epoch, first index of the batch)
            rngs = np.random.default_rng(
                [self.seed, self.epoch, int(idx[0])]
            ).spawn(len(imgs))
            batch["image_u8"] = np.stack(
                list(
                    self._pool.map(
                        lambda t: host_train_augment(
                            t[0], t[1], size=self.train_crop_size,
                            resize_to=self.host_resize_to,
                        ),
                        zip(imgs, rngs),
                    )
                )
            )
        if (
            self.with_image
            and self._use_native
            and "image" not in batch
            and "image_u8" not in batch
        ):
            from bioscan_clip_tpu.data import native_io

            bufs = self.reader.read_images_bytes(idx)
            out_h, out_w = self._native_out_hw(bufs[0])
            if self._use_native:  # may have been demoted by the probe above
                try:
                    frames = native_io.decode_batch(
                        bufs, target_short=self.host_resize_to,
                        out_h=out_h, out_w=out_w,
                        threads=self.decode_threads,
                    )
                    if self.eval_pre_cropped:
                        # crop the STANDARD slot (place_center output) —
                        # composing fit-to-slot + floor-div center crop,
                        # the exact two-stage geometry the device
                        # center_crop path applies, so aspect-ratio
                        # outliers stay bit-identical across paths
                        # (a single direct crop differed by 1px when both
                        # crop deltas were odd — ADVICE r4)
                        s = self.eval_crop_size
                        t = (out_h - s) // 2
                        l = (out_w - s) // 2
                        frames = np.ascontiguousarray(
                            frames[:, t : t + s, l : l + s]
                        )
                    batch["image_u8"] = frames
                except ValueError:
                    # corrupt image: python fallback
                    self._use_native = False
        if self.with_image and "image" not in batch and "image_u8" not in batch:
            bufs = self.reader.read_images_bytes(idx)
            imgs = list(self._pool.map(_decode_jpeg, bufs))
            if self.host_resize_to:
                imgs = list(
                    self._pool.map(
                        lambda im: _host_resize_shorter(
                            im, self.host_resize_to
                        ),
                        imgs,
                    )
                )
            shapes = {im.shape for im in imgs}
            if len(shapes) > 1:
                # rare aspect outliers: fit to the first image's slot
                # with the SAME center-crop / edge-replicate-pad
                # geometry as the native decoder (bscan_io.cc
                # place_center), so the two host paths produce
                # identical batches.
                h0, w0 = imgs[0].shape[:2]
                imgs = [_fit_to_slot(im, h0, w0) for im in imgs]
            if self.eval_pre_cropped:
                # crop AFTER slot unification: the same two-stage
                # fit-to-slot + floor-div crop composition as the device
                # center_crop path (outliers bit-identical — ADVICE r4)
                s = self.eval_crop_size
                imgs = [_fit_to_slot(im, s, s) for im in imgs]
            batch["image_u8"] = np.stack(imgs).astype(np.uint8)
        if self.with_dna:
            batch["dna"] = self.reader.read_dna_tokens(idx)
        if self.with_language:
            batch["language"] = self.reader.read_language_tokens(idx)
        if self.for_training:
            batch["labels"] = self.labels[idx]
        else:
            batch["label_dicts"] = self.reader.read_label_dicts(idx)
            batch["ids"] = self.reader.read_ids(idx)
        return batch

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_depth)
        stop = object()
        # cancellation: a consumer that abandons iteration mid-epoch
        # (bounded train runs, benches, `break`) closes this generator;
        # without it the producer stays blocked on q.put and its in-flight
        # decode work keeps pool threads alive past interpreter shutdown
        cancel = threading.Event()

        def _put(item) -> bool:
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for idx in self._index_batches():
                    if cancel.is_set() or not _put(self._make_batch(idx)):
                        return
            except BaseException as e:  # surface errors to the consumer
                _put(e)
            finally:
                # a full queue does NOT mean the consumer is gone — it may
                # simply not have drained yet; retry until it takes `stop`
                # or cancels (r4: put_nowait here dropped the sentinel at
                # end-of-epoch and the consumer blocked on q.get forever)
                _put(stop)

        t = threading.Thread(
            target=producer, daemon=True, name="bscan-prefetch"
        )
        t.start()
        completed = False
        try:
            while True:
                item = q.get()
                if item is stop:
                    completed = True
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            cancel.set()
            if not completed:
                # unblock a producer stuck on a full queue, then let it
                # observe `cancel` and exit
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=30.0)
        if self.for_training:
            self.epoch += 1
