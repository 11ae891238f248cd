"""Split generator + HDF5 builder + viz tests."""

import os

import numpy as np
import pandas as pd
import pytest

from bioscan_clip_tpu.data.splits import (
    assert_no_overlap,
    create_split_boundaries,
    create_splits,
    get_tail_species,
)


def _metadata(n_species=12, per=20, n_tail=4, n_single=3, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    i = 0

    def add(species, count):
        nonlocal i
        for _ in range(count):
            rows.append(
                {
                    "sampleid": f"S{i:05d}",
                    "uri": f"BIN:{species}",
                    "image_file": f"{i}.jpg",
                    "order": "Diptera",
                    "family": f"fam{hash(species) % 5}",
                    "genus": f"gen_{species}",
                    "species": species,
                }
            )
            i += 1

    for c in range(n_species):
        add(f"sp_{c}", per)
    for c in range(n_tail):
        add(f"tail_{c}", int(rng.integers(2, 9)))
    for c in range(n_single):
        add(f"single_{c}", 1)
    add("not_classified", 7)
    return pd.DataFrame(rows)


def test_boundaries():
    assert create_split_boundaries(100, [0.7, 0.1, 0.1, 0.1]) == [70, 80, 90]


def test_tail_species():
    md = _metadata()
    tails = set(get_tail_species(md))
    assert any(t.startswith("tail_") for t in tails)
    assert all(not t.startswith("sp_") for t in tails)


def test_create_splits_no_leakage():
    md = _metadata()
    out = create_splits(md, seed=7)
    assert set(out.columns) >= {"sampleid", "species", "split"}
    counts = out["split"].value_counts()
    assert counts["train_seen"] > counts["val_seen"]
    assert "single_species" in counts
    # unseen species never appear in seen splits
    seen_species = set(
        out[out["split"].isin(["train_seen", "val_seen", "test_seen"])]["species"]
    )
    unseen_species = set(
        out[out["split"].isin(["val_unseen", "test_unseen"])]["species"]
    )
    assert not (seen_species & unseen_species)
    # not_classified records stay in no_split
    nc = out[out["species"] == "not_classified"]
    assert (nc["split"] == "no_split").all()


def test_assert_no_overlap_raises():
    with pytest.raises(ValueError):
        assert_no_overlap(np.array([1, 2]), [np.array([2, 3])])


def test_hdf5_builder_roundtrip(tmp_path):
    from bioscan_clip_tpu.cli.generate_hdf5 import build_hdf5
    from bioscan_clip_tpu.data.hdf5 import SplitReader
    from tests.fixtures import make_jpeg

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    for i in range(12):
        fn = f"im{i}.jpg"
        (img_dir / fn).write_bytes(make_jpeg((i * 20 % 255, 80, 80), seed=i))
        rows.append(
            {
                "processid": f"P{i}",
                "sampleid": f"S{i}",
                "image_file": fn,
                "split": ["train", "val", "key_unseen", "pretrain"][i % 4],
                "order": "Diptera",
                "family": float("nan") if i == 3 else "Sciaridae",
                "genus": "Corynoptera",
                "species": f"sp_{i % 3}",
                "dna_barcode": "ACGT" * 30,
            }
        )
    md = pd.DataFrame(rows)
    out_path = str(tmp_path / "built.hdf5")
    lines = []
    # the builder fails loud without a tokenizer; exercise the native
    # WordPiece path with a local vocab (data/wordpiece.py)
    vocab = tmp_path / "vocab.txt"
    vocab.write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "diptera",
                   "not_classified", "##a", "fam", "gen", "spec"]) + "\n"
    )
    build_hdf5(md, str(img_dir), out_path, out=lines.append,
               vocab_path=str(vocab))

    r = SplitReader(out_path, "seen_keys")  # <- 'train' rows
    assert len(r) == 3
    labels = r.read_label_dicts()
    assert labels[0]["order"] == "Diptera"
    # NaN family -> not_classified (row 3 is 'pretrain' ->
    # no_split_and_seen_train)
    rv = SplitReader(out_path, "no_split_and_seen_train")
    assert any(
        d["family"] == "not_classified" for d in rv.read_label_dicts()
    )
    # all_keys = key_unseen + train
    ra = SplitReader(out_path, "all_keys")
    assert len(ra) == 6
    toks = ra.read_dna_tokens([0, 5])
    assert toks.shape == (2, 133)
    bufs = ra.read_images_bytes([0])
    assert bufs[0][:2] == b"\xff\xd8"


def test_viz_outputs(tmp_path):
    from bioscan_clip_tpu.utils.viz import (
        categorical_cmap,
        plot_confusion_matrix,
        plot_embeddings,
        plot_retrieval_grid,
        silhouette_scores,
    )

    rng = np.random.default_rng(0)
    feats = np.concatenate(
        [rng.normal(c * 3, 0.3, size=(20, 8)) for c in range(3)]
    ).astype(np.float32)
    labels = [
        {"order": f"o{c%2}", "family": f"f{c}", "genus": f"g{c}",
         "species": f"s{c}"}
        for c in range(3)
        for _ in range(20)
    ]
    p = plot_embeddings(feats, labels, level="species",
                        out_path=str(tmp_path / "emb.png"))
    assert os.path.exists(p)

    imgs = [np.zeros((32, 32, 3), np.uint8) for _ in range(2)]
    ret = [[np.ones((32, 32, 3), np.uint8)] * 3 for _ in range(2)]
    p = plot_retrieval_grid(
        imgs, ret, np.array([[1, 0, 1], [0, 0, 1]]),
        out_path=str(tmp_path / "grid.png"),
    )
    assert os.path.exists(p)

    p = plot_confusion_matrix(
        ["a", "b", "a", "c"], ["a", "b", "b", "c"],
        out_path=str(tmp_path / "cm.png"),
    )
    assert os.path.exists(p)

    scores = silhouette_scores(feats, labels, out=lambda s: None)
    assert scores["species"] > 0.5  # well separated clusters

    cm = categorical_cmap(3, 2)
    assert cm.N == 6
