"""INSECT dataset tests over synthetic .mat/hdf5/json fixtures + classifier
fine-tuning steps."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.fixtures import make_jpeg


@pytest.fixture(scope="module")
def insect_fixture(tmp_path_factory):
    import h5py
    import scipy.io as sio

    root = tmp_path_factory.mktemp("insect")
    n_classes, per = 4, 6
    n = n_classes * per
    species = [f"species_{i % n_classes}" for i in range(n)]
    ids = [f"IMG{i:04d}" for i in range(n)]
    barcodes = [("ACGT" * 40)[: 120] for _ in range(n)]
    labels = np.array([i % n_classes for i in range(n)]) + 1  # 1-based

    def cell(strings):
        return np.array(
            [[np.array([s])] for s in strings], dtype=object
        )

    res101 = {
        "ids": cell(ids),
        "nucleotides": cell(barcodes),
        "species": cell(species),
        "labels": labels.reshape(-1, 1),
        "bold_ids": cell(ids),
    }
    sio.savemat(str(root / "res101.mat"), res101)

    idx = np.arange(1, n + 1)  # 1-based
    att = {
        "train_loc": idx[:12].reshape(1, -1),
        "val_loc": idx[12:18].reshape(1, -1),
        "test_seen_loc": idx[18:21].reshape(1, -1),
        "test_unseen_loc": idx[21:24].reshape(1, -1),
        "trainval_loc": idx[:18].reshape(1, -1),
    }
    sio.savemat(str(root / "att_splits.mat"), att)

    with h5py.File(str(root / "INSECT_images.hdf5"), "w") as hf:
        g = hf.create_group("images")
        for i, name in enumerate(ids):
            jpg = make_jpeg((40 * (i % n_classes) + 40, 80, 120), seed=i)
            g.create_dataset(name, data=np.frombuffer(jpg, dtype=np.uint8))

    sp2other = {
        f"species_{c}": {
            "order": f"order_{c % 2}",
            "family": f"family_{c}",
            # genus intentionally missing for one class -> 'not_classified'
            **({"genus": f"genus_{c}"} if c != 3 else {}),
        }
        for c in range(n_classes)
    }
    with open(root / "specie_to_other_labels.json", "w") as f:
        json.dump(sp2other, f)

    from bioscan_clip_tpu.config.core import ConfigNode

    class Args:
        cfg = ConfigNode(
            {
                "model_config": {"batch_size": 6, "output_dim": 768},
                "insect_data": {
                    "path_to_att_splits_mat": str(root / "att_splits.mat"),
                    "path_to_res_101_mat": str(root / "res101.mat"),
                    "path_to_image_hdf5": str(root / "INSECT_images.hdf5"),
                    "species_to_other": str(
                        root / "specie_to_other_labels.json"
                    ),
                },
            }
        )

        def __getattr__(self, k):
            return getattr(self.cfg, k)

    return Args()


def test_insect_loader_splits(insect_fixture):
    from bioscan_clip_tpu.data.insect import load_insect_dataloader

    train, train_key, val, test_seen, test_unseen = load_insect_dataloader(
        insect_fixture
    )
    assert train.n == 12 and val.n == 6
    b = next(iter(train))
    assert b["image_u8"].shape[0] == 6
    assert b["dna"].shape == (6, 133)
    assert b["labels"].shape == (6,)
    be = next(iter(val))
    assert len(be["label_dicts"]) == 6
    # 4-level labels with not_classified fallback for missing genus
    all_loader = load_insect_dataloader(insect_fixture, load_all_in_one=True)
    d3 = [d for d in all_loader.label_dicts if d["species"] == "species_3"]
    assert d3 and d3[0]["genus"] == "not_classified"
    assert d3[0]["order"] == "order_1"


def test_insect_trainval_loader(insect_fixture):
    from bioscan_clip_tpu.data.insect import load_insect_dataloader_trainval

    tv = load_insect_dataloader_trainval(insect_fixture)
    assert tv.n == 18
    b = next(iter(tv))
    assert "labels" in b


def test_insect_mat_split_indexing(insect_fixture):
    """1-based .mat indices map to the right records."""
    from bioscan_clip_tpu.data.insect import load_insect_mat

    ids, bcs, sps = load_insect_mat(
        insect_fixture.insect_data.path_to_att_splits_mat,
        insect_fixture.insect_data.path_to_res_101_mat,
        "val_loc",
    )
    assert ids[0] == "IMG0012"  # val_loc starts at 1-based index 13


def test_classifier_fine_tune_and_eval(insect_fixture):
    from bioscan_clip_tpu.data.insect import load_insect_dataloader
    from bioscan_clip_tpu.models.heads import EncoderWithHead
    from bioscan_clip_tpu.models.mlp import MLPEncoder
    from bioscan_clip_tpu.models.vit import ViT, ViTConfig
    from bioscan_clip_tpu.parallel.mesh import create_mesh, shard_batch
    from bioscan_clip_tpu.train.fine_tuning import (
        evaluate_classifier,
        get_all_unique_species_from_loader,
        label_batch_to_species_idx,
        make_classifier_train_step,
    )
    from bioscan_clip_tpu.train.state import TrainState
    import optax

    train, train_key, val, test_seen, test_unseen = load_insect_dataloader(
        insect_fixture
    )
    unique = get_all_unique_species_from_loader(train_key)
    assert len(unique) == 4

    vit = ViT(
        ViTConfig(
            image_size=224, patch_size=32, hidden_size=32, num_layers=1,
            num_heads=2, num_classes=16, lora_rank=0,
        ),
        dtype=jnp.float32,
    )
    clf = EncoderWithHead(vit, len(unique))
    mesh = create_mesh(devices=jax.devices()[:2])
    params = clf.init(jax.random.PRNGKey(0), jnp.zeros((2, 224, 224, 3)))[
        "params"
    ]
    tx = optax.adamw(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx, apply_fn=None,
    )
    step = make_classifier_train_step(clf, mesh, modality="image")
    losses = []
    for epoch in range(2):
        for batch in train:
            db = shard_batch(
                {
                    "input": batch["image_u8"],
                    "target": label_batch_to_species_idx(
                        [train.label_dicts[int(l)] for l in batch["labels"]],
                        unique,
                    ),
                },
                mesh,
            )
            state, loss = step(state, db, jax.random.PRNGKey(0))
            losses.append(float(loss))
    assert all(np.isfinite(losses))
    acc = evaluate_classifier(
        state.params, clf, mesh, test_seen, unique, modality="image"
    )
    assert set(acc) == {"top1_accuracy", "top3_accuracy", "top5_accuracy"}
    assert 0 <= acc["top1_accuracy"] <= acc["top5_accuracy"] <= 1


def test_color_jitter():
    from bioscan_clip_tpu.data.transforms import color_jitter

    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (3, 16, 16, 3)).astype(
            np.float32
        )
    )
    out = np.asarray(color_jitter(imgs, jax.random.PRNGKey(0)))
    assert out.shape == imgs.shape
    assert out.min() >= 0 and out.max() <= 1
    assert np.abs(out - np.asarray(imgs)).max() > 0.01
    out2 = np.asarray(color_jitter(imgs, jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(out, out2)


def test_insect_train_loader_process_sharding(insect_fixture):
    """Multi-host: INSECT train loaders shard each epoch permutation by
    process stride with no overlap (eval loaders stay unsharded)."""
    from bioscan_clip_tpu.data.insect import InsectLoader

    l0 = InsectLoader(insect_fixture, "train_loc", for_training=True,
                      shuffle=True, batch_size=4, process_index=0,
                      process_count=2)
    l1 = InsectLoader(insect_fixture, "train_loc", for_training=True,
                      shuffle=True, batch_size=4, process_index=1,
                      process_count=2)
    i0 = np.concatenate(list(l0._index_batches()))
    i1 = np.concatenate(list(l1._index_batches()))
    assert len(np.intersect1d(i0, i1)) == 0  # disjoint shards
    assert len(i0) == len(i1)
    assert len(l0) == len(l1)
    # batches still materialize end-to-end on the sharded index stream
    b0 = next(iter(l0))
    assert b0["labels"].shape[0] == 4
    # eval loaders are unsharded regardless of process args
    ev = InsectLoader(insect_fixture, "val_loc", process_index=1,
                      process_count=2)
    n_eval = sum(len(b["ids"]) for b in ev)
    assert n_eval == ev.n
