"""Retrieval engine + metrics tests: exact top-k vs brute force (single and
8-device mesh), reference-semantics metric parity, report writers."""

import json
import os

import numpy as np
import pytest

from bioscan_clip_tpu.parallel.mesh import create_mesh
from bioscan_clip_tpu.retrieval.engine import (
    l2norm_np,
    make_prediction,
    topk_search,
)
from bioscan_clip_tpu.retrieval.metrics import (
    harmonic_mean,
    top_k_macro_accuracy,
    top_k_micro_accuracy,
)
from bioscan_clip_tpu.retrieval.report import (
    build_split_dict,
    inference_and_print_result,
)

LEVELS = ["order", "family", "genus", "species"]


def _brute_topk(q, k_feats, k):
    sims = q @ k_feats.T
    idx = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(sims, idx, axis=1), idx


@pytest.mark.parametrize("n_keys", [37, 1000, 4096])
@pytest.mark.parametrize("use_mesh", [False, True])
def test_topk_matches_bruteforce(n_keys, use_mesh):
    rng = np.random.default_rng(0)
    q = l2norm_np(rng.standard_normal((23, 16)).astype(np.float32))
    ks = l2norm_np(rng.standard_normal((n_keys, 16)).astype(np.float32))
    mesh = create_mesh() if use_mesh else None
    sims, idx = topk_search(q, ks, 5, mesh=mesh, key_chunk=256, query_chunk=7)
    bsims, bidx = _brute_topk(q, ks, 5)
    np.testing.assert_allclose(sims, bsims, atol=1e-5)
    # indices can differ on exact ties; check retrieved scores instead
    re_sims = np.take_along_axis(q @ ks.T, idx.astype(np.int64), axis=1)
    np.testing.assert_allclose(re_sims, bsims, atol=1e-5)


def test_topk_negative_sims_and_padding():
    """All-negative similarities must not be displaced by zero padding rows."""
    rng = np.random.default_rng(1)
    q = np.ones((3, 8), np.float32)
    ks = -np.abs(rng.standard_normal((10, 8)).astype(np.float32))  # all negative sims
    sims, idx = topk_search(q, ks, 4, key_chunk=8)
    assert (sims < 0).all()
    bsims, _ = _brute_topk(q, ks, 4)
    np.testing.assert_allclose(sims, bsims, atol=1e-5)


def test_k_larger_than_keys():
    q = np.eye(4, dtype=np.float32)
    ks = np.eye(4, dtype=np.float32)[:2]
    sims, idx = topk_search(q, ks, 5)
    assert sims.shape == (4, 2)


def _mk_labels(n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        out.append(
            {
                "order": f"o{rng.integers(0, 3)}",
                "family": f"f{rng.integers(0, 5)}",
                "genus": f"g{rng.integers(0, 8)}",
                "species": f"s{i % 10}",
            }
        )
    return out


def test_make_prediction_structure():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((6, 12)).astype(np.float32)
    ks = rng.standard_normal((20, 12)).astype(np.float32)
    labels = _mk_labels(20)
    preds, sims, idx = make_prediction(
        q, ks, labels, with_similarity=True, with_indices=True, max_k=3
    )
    assert len(preds) == 6
    assert set(preds[0].keys()) == set(LEVELS)
    assert len(preds[0]["species"]) == 3
    # labels correspond to indices
    assert preds[0]["order"][0] == labels[idx[0][0]]["order"]


def _reference_micro(pred_list, gt_list, k_list):
    """Naive reimplementation of inference_and_eval.py:448-464."""
    total = len(pred_list)
    out = {}
    for k in k_list:
        out[k] = {}
        for level in LEVELS:
            c = sum(
                1
                for p, g in zip(pred_list, gt_list)
                if g[level] in p[level][:k]
            )
            out[k][level] = c / total
    return out


def _reference_macro(pred_list, gt_list, k_list):
    """Naive reimplementation of inference_and_eval.py:467-511."""
    macro = {}
    for k in k_list:
        macro[k] = {}
        for level in LEVELS:
            pred_counts, gt_counts = {}, {}
            for p, g in zip(pred_list, gt_list):
                gl = g[level]
                pred_counts.setdefault(gl, 0)
                gt_counts.setdefault(gl, 0)
                if gl in p[level][:k]:
                    pred_counts[gl] += 1
                gt_counts[gl] += 1
            accs = [pred_counts[l] / gt_counts[l] for l in gt_counts]
            macro[k][level] = sum(accs) / len(accs)
    return macro


def test_metrics_match_reference_semantics():
    rng = np.random.default_rng(3)
    n = 50
    gt = _mk_labels(n, seed=4)
    keys = _mk_labels(80, seed=5)
    preds = []
    for _ in range(n):
        picks = rng.integers(0, 80, size=5)
        preds.append({lvl: [keys[i][lvl] for i in picks] for lvl in LEVELS})

    micro = top_k_micro_accuracy(preds, gt, [1, 3, 5])
    ref_micro = _reference_micro(preds, gt, [1, 3, 5])
    for k in [1, 3, 5]:
        for lvl in LEVELS:
            assert micro[k][lvl] == pytest.approx(ref_micro[k][lvl])

    macro, per_class = top_k_macro_accuracy(preds, gt, [1, 3, 5])
    ref_macro = _reference_macro(preds, gt, [1, 3, 5])
    for k in [1, 3, 5]:
        for lvl in LEVELS:
            assert macro[k][lvl] == pytest.approx(ref_macro[k][lvl])
    assert all(0 <= v <= 1 for v in per_class[1]["species"].values())


def test_harmonic_mean():
    assert harmonic_mean(0.42, 0.301) == pytest.approx(
        2 * 0.42 * 0.301 / (0.42 + 0.301)
    )
    assert harmonic_mean(0.0, 0.0) == 0.0


def test_full_sweep_and_reports(tmp_path, monkeypatch):
    """Synthetic perfectly-separable embeddings -> 100% accuracy everywhere;
    report files are written."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(6)
    n_cls, per, D = 5, 4, 32
    protos = l2norm_np(rng.standard_normal((n_cls, D)).astype(np.float32))

    def make_split(n_each, noise):
        feats, labels = [], []
        for c in range(n_cls):
            for _ in range(n_each):
                feats.append(protos[c] + noise * rng.standard_normal(D))
                labels.append(
                    {
                        "order": f"o{c % 2}",
                        "family": f"f{c}",
                        "genus": f"g{c}",
                        "species": f"s{c}",
                    }
                )
        return np.asarray(feats, np.float32), labels

    k_img, k_lab = make_split(per, 0.01)
    k_dna, _ = make_split(per, 0.01)
    k_txt, _ = make_split(per, 0.01)
    keys = build_split_dict(
        image=k_img, dna=k_dna, language=k_txt, label_list=k_lab,
        for_key_set=True,
    )
    assert keys["all_key_features"].shape == (3 * n_cls * per, D)
    assert len(keys["all_key_features_label"]) == 3 * n_cls * per

    s_img, s_lab = make_split(3, 0.01)
    s_dna, _ = make_split(3, 0.01)
    s_txt, _ = make_split(3, 0.01)
    seen = build_split_dict(image=s_img, dna=s_dna, language=s_txt, label_list=s_lab)
    unseen = build_split_dict(image=s_img, dna=s_dna, language=s_txt, label_list=s_lab)

    class _Args:
        save_inference = True
        model_config = None

    lines = []
    acc, per_class, pred = inference_and_print_result(
        keys, seen, unseen, args=_Args(), k_list=[1, 3, 5], out=lines.append
    )
    # image query x dna key: perfect separation -> top-1 species == 1.0
    assert acc["encoded_image_feature"]["encoded_dna_feature"]["seen"][
        "micro_acc"
    ][1]["species"] == pytest.approx(1.0)
    # 5 query types x 6 key types all present
    assert len(acc) == 5
    assert all(len(v) == 6 for v in acc.values())
    assert os.path.exists("logs/accuracy.json")
    assert os.path.exists("logs/results.csv")
    assert os.path.exists("logs/raw.csv")
    j = json.load(open("logs/accuracy.json"))
    assert "encoded_image_feature" in j
    assert any("|" in l for l in lines)  # ASCII table printed


def test_full_sweep_int8_precision(tmp_path, monkeypatch):
    """inference_and_eval_setting.retrieval_precision=int8 runs the whole
    sweep on quantized resident keys and still scores the perfectly
    separable synthetic data at 100%."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(13)
    n_cls, per, D = 4, 3, 32
    protos = l2norm_np(rng.standard_normal((n_cls, D)).astype(np.float32))

    def make_split(n_each):
        feats, labels = [], []
        for c in range(n_cls):
            for _ in range(n_each):
                feats.append(protos[c] + 0.01 * rng.standard_normal(D))
                labels.append(
                    {"order": f"o{c % 2}", "family": f"f{c}",
                     "genus": f"g{c}", "species": f"s{c}"}
                )
        return np.asarray(feats, np.float32), labels

    k_img, k_lab = make_split(per)
    keys = build_split_dict(
        image=k_img, dna=None, language=None, label_list=k_lab,
        for_key_set=True,
    )
    s_img, s_lab = make_split(2)
    seen = build_split_dict(image=s_img, dna=None, language=None,
                            label_list=s_lab)

    class _IES:
        retrieval_precision = "int8"

    class _Args:
        save_inference = False
        model_config = None
        inference_and_eval_setting = _IES()

    acc, _, _ = inference_and_print_result(
        keys, seen, seen, args=_Args(), k_list=[1], out=lambda *_: None
    )
    assert acc["encoded_image_feature"]["encoded_image_feature"]["seen"][
        "micro_acc"
    ][1]["species"] == pytest.approx(1.0)

    # the same int8 sweep on the multi-device mesh (no silent fp32
    # fallback anymore — codes/scales shard over the data axis)
    mesh = create_mesh()
    acc_m, _, _ = inference_and_print_result(
        keys, seen, seen, args=_Args(), k_list=[1], mesh=mesh,
        out=lambda *_: None,
    )
    assert acc_m["encoded_image_feature"]["encoded_image_feature"]["seen"][
        "micro_acc"
    ][1]["species"] == pytest.approx(1.0)


def test_multi_device_pallas_path_exact():
    """The Pallas fused kernel as the per-shard local search inside
    shard_map (VERDICT r1 item 9): exact vs brute force on the 8-device
    mesh, uneven shards + padded tail included (interpret mode on CPU)."""
    from bioscan_clip_tpu.parallel.mesh import create_mesh
    from bioscan_clip_tpu.retrieval.engine import topk_search

    rng = np.random.default_rng(17)
    n_keys, d, n_q, k = 3000, 32, 70, 5  # 3000/8 -> uneven, pads to 512
    keys = rng.standard_normal((n_keys, d)).astype(np.float32)
    queries = rng.standard_normal((n_q, d)).astype(np.float32)

    mesh = create_mesh()
    vals, idxs = topk_search(
        queries, keys, k, mesh=mesh, use_pallas=True, _interpret=True,
    )

    sims = queries @ keys.T
    ref_idx = np.argsort(-sims, axis=1)[:, :k]
    ref_vals = np.take_along_axis(sims, ref_idx, axis=1)
    np.testing.assert_allclose(vals, ref_vals, atol=1e-5, rtol=1e-5)
    # indices may differ on exact ties; compare via values
    got_vals = np.take_along_axis(sims, idxs.astype(np.int64), axis=1)
    np.testing.assert_allclose(got_vals, ref_vals, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("use_mesh", [False, True])
def test_topk_host_streamed_matches_bruteforce(use_mesh):
    """Keys larger than the device budget: host-streamed slabs + exact
    host merge must equal brute force (the >HBM BIOSCAN-5M key path)."""
    rng = np.random.default_rng(3)
    q = l2norm_np(rng.standard_normal((17, 16)).astype(np.float32))
    ks = l2norm_np(rng.standard_normal((5000, 16)).astype(np.float32))
    mesh = create_mesh() if use_mesh else None
    sims, idx = topk_search(
        q, ks, 5, mesh=mesh, key_chunk=256, query_chunk=9,
        max_device_keys=1024,  # force 5 slabs incl. an uneven tail
    )
    bsims, _ = _brute_topk(q, ks, 5)
    np.testing.assert_allclose(sims, bsims, atol=1e-5)
    re_sims = np.take_along_axis(q @ ks.T, idx.astype(np.int64), axis=1)
    np.testing.assert_allclose(re_sims, bsims, atol=1e-5)


def test_prepared_keys_reuse_and_equivalence():
    """PreparedKeys: one normalize+upload reused across searches equals the
    per-call path; streaming PreparedKeys (double-buffered slabs) is exact."""
    from bioscan_clip_tpu.retrieval.engine import (
        PreparedKeys,
        l2norm_np,
        make_prediction,
        topk_search,
    )

    rng = np.random.default_rng(7)
    keys = rng.standard_normal((3000, 32)).astype(np.float32)
    qs = rng.standard_normal((40, 32)).astype(np.float32)
    labels = [
        {"order": f"o{i%3}", "family": f"f{i%5}", "genus": f"g{i%7}",
         "species": f"s{i%11}"}
        for i in range(3000)
    ]

    ref = make_prediction(qs, keys, labels, max_k=5)
    pk = PreparedKeys(keys)  # normalizes at construction
    got = make_prediction(qs, pk, labels, max_k=5)
    assert got == ref
    got2 = make_prediction(qs[5:], pk, labels, max_k=5)  # reuse
    assert got2 == ref[5:]

    # streaming PreparedKeys: exact vs resident
    kn = l2norm_np(keys)
    v_ref, i_ref = topk_search(l2norm_np(qs), kn, 5)
    pk_s = PreparedKeys(keys, max_device_keys=700)  # forces 5 slabs
    assert pk_s.streaming
    v, i = topk_search(l2norm_np(qs), pk_s, 5)
    np.testing.assert_array_equal(i, i_ref)
    np.testing.assert_allclose(v, v_ref, rtol=1e-5)
