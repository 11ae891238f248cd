"""Data pipeline tests over a synthetic schema-compatible HDF5: reader,
loader iteration, sharding, factories, and the minimum end-to-end slice
(loader -> model -> retrieval report; loader -> train epoch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bioscan_clip_tpu.data.dataset import (
    construct_dataloader,
    load_bioscan_dataloader_all_small_splits,
    load_dataloader,
)
from bioscan_clip_tpu.data.hdf5 import SplitReader, get_len_dict
from bioscan_clip_tpu.data.pipeline import BioscanLoader
from tests.fixtures import SyntheticArgs, build_synthetic_dataset


@pytest.fixture(scope="module")
def dataset_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "synthetic.hdf5"
    return build_synthetic_dataset(str(p), n_classes=4, per_class=6)


@pytest.fixture(scope="module")
def args(dataset_path):
    return SyntheticArgs(dataset_path, batch_size=8)


def test_reader_roundtrip(dataset_path):
    r = SplitReader(str(dataset_path), "val_seen")
    assert len(r) == 12
    idx = np.array([5, 0, 7])
    bufs = r.read_images_bytes(idx)
    assert all(b[:2] == b"\xff\xd8" for b in bufs)  # JPEG magic
    toks = r.read_dna_tokens(idx)
    assert toks.shape == (3, 133) and toks[:, 0].tolist() == [0, 0, 0]
    labels = r.read_label_dicts(idx)
    assert set(labels[0].keys()) == {"order", "family", "genus", "species"}
    lang = r.read_language_tokens(idx)
    assert lang["input_ids"].shape == (3, 20)
    # label alignment under unsorted fancy index
    full = r.read_label_dicts()
    for pos, i in enumerate(idx):
        assert labels[pos] == full[i]


def test_len_dict(args):
    d = get_len_dict(args)
    assert d["no_split_and_seen_train"] == 24
    assert d["val_seen"] == 12


def test_loader_batches(args, dataset_path):
    loader = construct_dataloader(args, "val_seen")
    batches = list(loader)
    assert len(batches) == 2  # 12 / 8 -> 8 + 4 (no drop for eval)
    b = batches[0]
    # eval batches ship the torchvision-EXACT host-preprocessed tensor
    # (float32 224², the checkpoint-parity path) by default
    assert b["image"].shape == (8, 224, 224, 3)
    assert b["image"].dtype == np.float32
    assert b["dna"].shape == (8, 133)
    assert b["language"]["input_ids"].shape == (8, 20)
    assert len(b["label_dicts"]) == 8
    assert len(b["ids"]) == 8
    assert batches[1]["image"].shape[0] == 4


def test_abandoned_iteration_stops_producer(args, dataset_path):
    """A consumer that breaks out mid-epoch (bounded train runs, benches)
    must not leave the prefetch producer blocked on a full queue — the
    generator's close path cancels it (r4: a 40-step bench process sat in
    interpreter shutdown for its entire 30-min timeout)."""
    import threading
    import time

    def producers():
        return [
            t for t in threading.enumerate() if t.name == "bscan-prefetch"
        ]

    loader = construct_dataloader(args, "no_split_and_seen_train")
    it = iter(loader)
    next(it)
    assert producers()
    it.close()  # what `del`/GC does on abandonment
    deadline = time.time() + 40
    while producers() and time.time() < deadline:
        time.sleep(0.05)
    assert not producers()


def test_loader_batches_uint8_fast_path(args, dataset_path):
    """tpu.eval_host_parity_resize=false opts back into raw uint8 + device
    resize (the throughput path)."""
    args.cfg.merge({"tpu": {"eval_host_parity_resize": False}})
    loader = construct_dataloader(args, "val_seen")
    b = next(iter(loader))
    assert b["image_u8"].dtype == np.uint8
    assert b["image_u8"].shape[0] == 8


def test_eval_host_crop_bit_identical(args, dataset_path):
    """tpu.eval_host_crop ships (224, 224) u8 frames that are an exact
    center-crop slice of the uncropped eval frame; eval_transform with
    pre_cropped=True then produces bit-identical model inputs while the
    feed carries ~2x fewer bytes."""
    from bioscan_clip_tpu.data.transforms import eval_transform

    full = BioscanLoader(
        str(dataset_path), "val_seen", batch_size=8,
        eval_parity=False, eval_host_crop=False,
    )
    cropped = BioscanLoader(
        str(dataset_path), "val_seen", batch_size=8,
        eval_parity=False, eval_host_crop=True,
    )
    assert not full.eval_pre_cropped and cropped.eval_pre_cropped
    bf = next(iter(full))["image_u8"]
    bc = next(iter(cropped))["image_u8"]
    assert bc.shape[1:] == (224, 224, 3)
    _, H, W, _ = bf.shape
    top, left = (H - 224) // 2, (W - 224) // 2
    np.testing.assert_array_equal(
        bc, bf[:, top:top + 224, left:left + 224]
    )
    a = eval_transform(jnp.asarray(bf))
    b = eval_transform(jnp.asarray(bc), pre_cropped=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # shape contract: pre_cropped rejects non-(size, size) frames
    with pytest.raises(ValueError):
        eval_transform(jnp.asarray(bf), pre_cropped=True)


def test_eval_host_crop_extract_features_equality(args):
    """extract_features auto-detects eval_pre_cropped loaders and returns
    identical embeddings (same model inputs by construction)."""
    from bioscan_clip_tpu.models.clip import init_clip_params
    from bioscan_clip_tpu.parallel.mesh import create_mesh
    from bioscan_clip_tpu.train.loop import extract_features

    model = _tiny_full_model()
    params = init_clip_params(model, jax.random.PRNGKey(0))
    mesh = create_mesh(devices=jax.devices()[:1])
    args.cfg.merge({"tpu": {"eval_host_parity_resize": False,
                            "eval_host_crop": False}})
    d_full = extract_features(
        params, model, mesh, construct_dataloader(args, "val_seen"),
    )
    args.cfg.merge({"tpu": {"eval_host_crop": True}})
    loader = construct_dataloader(args, "val_seen")
    assert loader.eval_pre_cropped
    d_crop = extract_features(params, model, mesh, loader)
    np.testing.assert_array_equal(
        d_full["encoded_image_feature"], d_crop["encoded_image_feature"]
    )


def test_shuffle_window_locality_and_coverage(dataset_path):
    """Window shuffle: every epoch is still a full permutation of the
    split, each index stays inside its contiguous window (disk-local
    reads), the window ORDER varies, and epochs differ."""
    loader = BioscanLoader(
        str(dataset_path), "no_split_and_seen_train", batch_size=4,
        for_training=True, shuffle=True, shuffle_window=8, with_image=False,
    )
    idx = np.concatenate(list(loader._index_batches()))
    n = loader.n
    assert sorted(idx.tolist()) == list(range(n))  # full coverage
    # each contiguous run of 8 emitted indices comes from ONE window
    w = 8
    for s in range(0, n - w + 1, w):
        run = idx[s : s + w]
        assert run.max() - run.min() < w, run
    loader.set_epoch(1)
    idx2 = np.concatenate(list(loader._index_batches()))
    assert not np.array_equal(idx, idx2)  # epochs reshuffle
    loader.set_epoch(0)
    idx0 = np.concatenate(list(loader._index_batches()))
    np.testing.assert_array_equal(idx, idx0)  # deterministic in epoch


def test_extract_features_grouped_equality(args):
    """Dispatch-amortized grouped extraction (group_samples>0: K batches
    merged, all towers in one jit per group) returns the same embeddings,
    labels and ids as the per-batch path — including the padded final
    partial group (12 records, batch 8, group capacity 16)."""
    from bioscan_clip_tpu.models.clip import init_clip_params
    from bioscan_clip_tpu.parallel.mesh import create_mesh
    from bioscan_clip_tpu.train.loop import extract_features

    model = _tiny_full_model()
    params = init_clip_params(model, jax.random.PRNGKey(0))
    mesh = create_mesh(devices=jax.devices()[:1])
    args.cfg.merge({"tpu": {"eval_host_parity_resize": False,
                            "eval_host_crop": True}})
    base = extract_features(
        params, model, mesh, construct_dataloader(args, "val_seen"),
        for_key_set=True, group_samples=0,
    )
    marks = []
    grouped = extract_features(
        params, model, mesh, construct_dataloader(args, "val_seen"),
        for_key_set=True, group_samples=16,
        progress=lambda i, t: marks.append(i),
    )
    assert marks == [0]  # one progress mark per group start
    for k in ("encoded_image_feature", "encoded_dna_feature",
              "encoded_language_feature", "averaged_feature",
              "concatenated_feature", "all_key_features"):
        np.testing.assert_allclose(
            base[k], grouped[k], rtol=0, atol=1e-6, err_msg=k
        )
    assert base["label_list"] == grouped["label_list"]
    assert base["file_name_list"] == grouped["file_name_list"]
    assert grouped["encoded_image_feature"].shape[0] == 12


def test_train_loader_drop_last_and_shuffle(args):
    loader = construct_dataloader(
        args, "no_split_and_seen_train", for_pre_train=True, shuffle=True
    )
    batches = list(loader)
    assert len(batches) == 3  # 24/8 full batches, drop_last
    assert all(b["labels"].shape == (8,) for b in batches)
    # labels are instance ids (dataset.py:147)
    all_labels = np.concatenate([b["labels"] for b in batches])
    assert len(set(all_labels.tolist())) == 24
    # next epoch shuffles differently
    batches2 = list(loader)
    assert not np.array_equal(batches[0]["labels"], batches2[0]["labels"])


def test_process_sharding(dataset_path):
    a = SyntheticArgs(dataset_path, batch_size=4)
    l0 = construct_dataloader(
        a, "no_split_and_seen_train", for_pre_train=True,
        process_index=0, process_count=2,
    )
    l1 = construct_dataloader(
        a, "no_split_and_seen_train", for_pre_train=True,
        process_index=1, process_count=2,
    )
    s0 = np.concatenate([b["labels"] for b in l0])
    s1 = np.concatenate([b["labels"] for b in l1])
    assert len(np.intersect1d(s0, s1)) == 0
    assert len(s0) == len(s1) == 12


def test_factories_return_arity(args):
    out = load_dataloader(args)
    assert len(out) == 4
    out9 = load_bioscan_dataloader_all_small_splits(args)
    assert len(out9) == 9
    assert out9[8].split == "all_keys"


def _tiny_full_model():
    from bioscan_clip_tpu.models.bert import (
        BarcodeBertDnaEncoder,
        BertConfig,
        BertTextEncoder,
    )
    from bioscan_clip_tpu.models.clip import MultiModalCLIP
    from bioscan_clip_tpu.models.vit import ViT, ViTConfig

    bert_kw = dict(
        hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
        lora_rank=2, hidden_dropout=0.0, attention_dropout=0.0,
    )
    return MultiModalCLIP(
        image_encoder=ViT(
            ViTConfig(
                image_size=224, patch_size=32, hidden_size=32, num_layers=1,
                num_heads=2, num_classes=32, lora_rank=2,
            ),
            dtype=jnp.float32,
        ),
        dna_encoder=BarcodeBertDnaEncoder(
            BertConfig(vocab_size=1027, **bert_kw), output_dim=32,
            dtype=jnp.float32,
        ),
        language_encoder=BertTextEncoder(
            BertConfig(vocab_size=30522, **bert_kw), output_dim=32,
            dtype=jnp.float32,
        ),
    )


def test_end_to_end_extract_and_eval(args):
    """Minimum end-to-end slice: loaders -> tiny model -> features ->
    on-device retrieval -> accuracy report (SURVEY.md §7 stage 4)."""
    from bioscan_clip_tpu.models.clip import init_clip_params
    from bioscan_clip_tpu.parallel.mesh import create_mesh
    from bioscan_clip_tpu.retrieval.report import inference_and_print_result
    from bioscan_clip_tpu.train.loop import extract_features

    model = _tiny_full_model()
    params = init_clip_params(model, jax.random.PRNGKey(0))
    mesh = create_mesh(devices=jax.devices()[:1])

    _, seen_loader, unseen_loader, keys_loader = load_dataloader(args)
    keys = extract_features(params, model, mesh, keys_loader, for_key_set=True)
    seen = extract_features(params, model, mesh, seen_loader)
    unseen = extract_features(params, model, mesh, unseen_loader)

    assert keys["encoded_image_feature"].shape == (16, 32)
    assert keys["all_key_features"].shape == (48, 32)
    assert len(keys["label_list"]) == 16

    lines = []
    acc, _, _ = inference_and_print_result(
        keys, seen, unseen, args=args, k_list=[1, 3, 5], out=lines.append
    )
    v = acc["encoded_image_feature"]["encoded_dna_feature"]["seen"][
        "micro_acc"
    ][1]["species"]
    assert 0.0 <= v <= 1.0
    assert any("micro_acc top-1" in l for l in lines)


def test_end_to_end_train_epoch(args):
    """loaders -> device-side augmentation -> jitted train step -> loss."""
    from bioscan_clip_tpu.parallel.mesh import create_mesh
    from bioscan_clip_tpu.train.loop import make_train_step, train_epoch
    from bioscan_clip_tpu.train.state import create_train_state

    model = _tiny_full_model()
    from bioscan_clip_tpu.models.clip import init_clip_params

    params = init_clip_params(model, jax.random.PRNGKey(0))
    state = create_train_state(model, params, lambda s: 1e-3)
    mesh = create_mesh()  # 8 virtual devices; batch 8 -> 1 per device
    step = make_train_step(model, mesh)
    loader, *_ = load_dataloader(args)
    state, stats = train_epoch(
        state, step, loader, mesh, jax.random.PRNGKey(0), 0, 1,
        logger=lambda s: None,
    )
    assert int(state.step) == 3
    assert stats["samples_per_s"] > 0


def test_train_crop_loader_and_transform(dataset_path):
    """tpu.train_crop: host RandomResizedCrop emits (B, 224, 224, 3) uint8
    and train_transform_auto skips its device crop stage on that shape."""
    a = SyntheticArgs(dataset_path, batch_size=8)
    a.cfg.merge({"tpu": {"train_crop": True}})
    loader = construct_dataloader(
        a, "no_split_and_seen_train", for_pre_train=True, shuffle=True
    )
    b = next(iter(loader))
    assert b["image_u8"].dtype == np.uint8
    assert b["image_u8"].shape == (8, 224, 224, 3)

    from bioscan_clip_tpu.data.transforms import train_transform_auto

    out = train_transform_auto(
        jnp.asarray(b["image_u8"]), jax.random.PRNGKey(0)
    )
    assert out.shape == (8, 224, 224, 3)
    assert out.dtype == jnp.float32
    assert float(out.max()) <= 1.0 and float(out.min()) >= 0.0
    # determinism in (seed, epoch, batch head): a fresh loader reproduces
    loader2 = construct_dataloader(
        a, "no_split_and_seen_train", for_pre_train=True, shuffle=True
    )
    b2 = next(iter(loader2))
    np.testing.assert_array_equal(b["image_u8"], b2["image_u8"])


def test_host_random_resized_crop_semantics():
    from bioscan_clip_tpu.data.transforms import host_random_resized_crop

    img = (np.random.default_rng(0).integers(
        0, 256, size=(300, 400, 3))).astype(np.uint8)
    rng = np.random.default_rng(1)
    out = host_random_resized_crop(img, rng, size=224, resize_to=256)
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8
    # tiny source still produces a full-size crop (fallback path)
    tiny = img[:40, :30]
    out2 = host_random_resized_crop(tiny, np.random.default_rng(2), size=224)
    assert out2.shape == (224, 224, 3)
