"""Native BZSL classifier tests (retrieval/bzsl_classifier.py, cli/bzsl_eval).

Synthetic geometry: classes are Gaussian clusters in image space whose DNA
side-info means mirror the image-space layout, so unseen classes are
recoverable from their DNA neighbours — the premise of the BZSL model
(Badirli et al. 2021)."""

import json
import os

import numpy as np
import pytest

from bioscan_clip_tpu.retrieval.bzsl_classifier import (
    BZSLClassifier,
    BZSLParams,
    seen_unseen_harmonic_accuracy,
    tune_hyperparameters,
)


def make_world(d=8, n_classes=12, n_unseen=3, n_per=30, seed=0):
    rng = np.random.default_rng(seed)
    # class centers on a smooth manifold (random walk with small steps), so
    # DNA-space neighbours are image-space neighbours — the geometric premise
    # that makes surrogate priors informative for unseen classes
    centers = np.cumsum(rng.standard_normal((n_classes, d)) * 1.5, axis=0)
    dna_means = {
        c: centers[c] + 0.1 * rng.standard_normal(d)
        for c in range(n_classes)
    }
    # unseen classes interspersed among seen relatives (as in real taxa:
    # an unseen species has seen congeners on both sides), not clumped at
    # the end of the manifold where surrogates are one-sided
    unseen = list(range(2, n_classes, max(2, n_classes // n_unseen)))[:n_unseen]
    feats, labels = [], []
    for c in range(n_classes):
        feats.append(centers[c] + 0.5 * rng.standard_normal((n_per, d)))
        labels.append(np.full(n_per, c))
    X = np.concatenate(feats)
    y = np.concatenate(labels)
    seen_mask = ~np.isin(y, unseen)
    return X, y, dna_means, unseen, seen_mask


def test_seen_accuracy_high_unseen_nonzero():
    X, y, dna_means, unseen, seen_mask = make_world()
    rng = np.random.default_rng(1)
    train_idx = np.where(seen_mask)[0]
    train_idx = rng.permutation(train_idx)
    fit, val = train_idx[: int(0.8 * len(train_idx))], train_idx[int(0.8 * len(train_idx)):]
    test_idx = np.concatenate([val, np.where(~seen_mask)[0]])

    # prior scale must cover the surrogate-to-unseen offset (~1 manifold
    # step here); tune_hyperparameters finds this regime automatically on
    # real data — pinned for determinism
    clf = BZSLClassifier(BZSLParams(K=2, s=2.0, kappa_1=2.0)).fit(
        X[fit], y[fit], dna_means, unseen
    )
    pred = clf.predict(X[test_idx])
    res = seen_unseen_harmonic_accuracy(y[test_idx], pred, unseen)
    assert res["seen"] > 0.9  # clusters are well separated
    assert res["unseen"] > 0.3  # recovered through DNA surrogates alone
    assert res["harmonic"] > 0.4


def test_unseen_recovery_when_surrogates_bracket():
    """An unseen class whose true center IS the mean of its two surrogate
    classes gets high unseen accuracy (the ideal BZSL geometry)."""
    d = 6
    rng = np.random.default_rng(2)
    cA = np.zeros(d)
    cB = np.ones(d) * 4.0
    cU = (cA + cB) / 2.0  # unseen sits exactly between its surrogates
    far = np.ones(d) * -8.0
    centers = {0: cA, 1: cB, 2: cU, 3: far}
    dna_means = {c: centers[c] for c in centers}
    X, y = [], []
    for c in (0, 1, 3):
        X.append(centers[c] + 0.4 * rng.standard_normal((40, d)))
        y.append(np.full(40, c))
    Xq = centers[2] + 0.4 * rng.standard_normal((40, d))
    clf = BZSLClassifier(BZSLParams(K=2, kappa_1=5.0, s=0.5)).fit(
        np.concatenate(X), np.concatenate(y), dna_means, [2]
    )
    pred = clf.predict(Xq)
    assert (pred == 2).mean() > 0.8


def test_log_ppd_matches_scipy_student_t_1class():
    """PPD math vs scipy.stats.multivariate_t for one seen class."""
    from scipy.stats import multivariate_t

    d = 4
    rng = np.random.default_rng(3)
    X = rng.standard_normal((50, d)) * 1.3 + 2.0
    y = np.zeros(50, np.int64)
    dna = {0: np.zeros(d)}
    p = BZSLParams(kappa_0=0.5, m_offset=7.0, s=2.0, K=1)
    clf = BZSLClassifier(p).fit(X, y, dna, [])

    q = rng.standard_normal((5, d))
    ours = clf.log_ppd(q)[:, 0]
    ref = multivariate_t(
        loc=clf.locs_[0],
        shape=clf.chols_[0] @ clf.chols_[0].T,
        df=clf.dfs_[0],
    ).logpdf(q)
    np.testing.assert_allclose(ours, ref, rtol=1e-8)


def test_tuning_returns_params():
    X, y, dna_means, unseen, seen_mask = make_world(n_classes=8, n_unseen=2)
    params, h = tune_hyperparameters(
        X[seen_mask], y[seen_mask], dna_means,
        grid={"kappa_0": [0.5], "kappa_1": [10.0], "m_offset": [5.0],
              "s": [0.5, 2.0], "K": [2]},
    )
    assert params is not None and 0.0 <= h <= 1.0


def test_cli_roundtrip(tmp_path):
    """CSV + .mat -> cli/bzsl_eval.run -> results json (the documented
    README.md:164-229 workflow, natively)."""
    import scipy.io as sio

    from bioscan_clip_tpu.cli import bzsl_eval
    from bioscan_clip_tpu.config.core import ConfigNode
    from bioscan_clip_tpu.retrieval.bzsl import export_bzsl_csvs

    X, y, dna_means, unseen, seen_mask = make_world(
        d=6, n_classes=8, n_unseen=2, n_per=20, seed=4
    )
    # per-sample DNA features whose class means equal dna_means
    dna_feats = np.stack([dna_means[int(c)] for c in y])
    emb = tmp_path / "emb"
    export_bzsl_csvs(str(emb), dna_feats, X, y, out=lambda *a: None)

    # att_splits/res101 with 1-based indices
    seen_idx = np.where(seen_mask)[0]
    rng = np.random.default_rng(5)
    seen_idx = rng.permutation(seen_idx)
    n_tv = int(0.8 * len(seen_idx))
    sio.savemat(
        str(tmp_path / "att_splits.mat"),
        {
            "trainval_loc": seen_idx[:n_tv] + 1,
            "test_seen_loc": seen_idx[n_tv:] + 1,
            "test_unseen_loc": np.where(~seen_mask)[0] + 1,
        },
    )
    sio.savemat(str(tmp_path / "res101.mat"), {"labels": y + 1})

    args = ConfigNode(
        {
            "project_root_path": str(tmp_path),
            "insect_data": {
                "path_to_att_splits_mat": str(tmp_path / "att_splits.mat"),
                "path_to_res_101_mat": str(tmp_path / "res101.mat"),
            },
        }
    )
    lines = []
    res = bzsl_eval.run(args, embeddings_dir=str(emb), out=lines.append)
    assert 0.0 <= res["harmonic"] <= 1.0
    assert res["seen"] > 0.5
    saved = json.loads((emb / "bzsl_results.json").read_text())
    assert saved["accuracy"] == res
    assert any("BZSL accuracy" in l for l in lines)
