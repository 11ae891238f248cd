"""Threshold-routing (method 1/2), BZSL export, flatten_csv tests."""

import numpy as np
import pytest

from bioscan_clip_tpu.retrieval.bzsl import (
    class_averaged_embeddings,
    export_bzsl_csvs,
)
from bioscan_clip_tpu.retrieval.methods import (
    decide_prediction_with_threshold,
    get_final_pred_and_acc,
    harmonic_mean_list,
    method_1_eval,
    print_acc_for_google_doc,
    search_threshold_with_harmonic_mean,
)

LEVELS = ["order", "family", "genus", "species"]


def _pred(species_names):
    return {
        "order": [f"o_{s}" for s in species_names],
        "family": [f"f_{s}" for s in species_names],
        "genus": [f"g_{s}" for s in species_names],
        "species": list(species_names),
    }


def _gt(s):
    return {"order": f"o_{s}", "family": f"f_{s}", "genus": f"g_{s}", "species": s}


def test_decide_prediction_routing():
    primary = [_pred(["a", "b", "c"])]
    fallback = [_pred(["x", "y", "z"])]
    conf = [[0.9, 0.2, 0.8]]
    final = decide_prediction_with_threshold(primary, conf, fallback, 0.5)
    assert final[0]["species"] == ["a", "y", "c"]
    assert final[0]["order"] == ["o_a", "o_y", "o_c"]


def test_harmonic_mean_list():
    assert harmonic_mean_list([0.5, 0.5]) == pytest.approx(0.5)
    assert harmonic_mean_list([1.0, 0.0]) == 0.0
    assert harmonic_mean_list([0.42, 0.301]) == pytest.approx(
        2 / (1 / 0.42 + 1 / 0.301)
    )


def test_method_1_routing_separates_seen_unseen():
    """Seen queries correct via primary branch (high sim), unseen correct
    only via fallback (low sim) -> the searched threshold must route both
    correctly."""
    k = 3
    # seen queries: primary prediction right, sim high; fallback wrong
    seen_data = {
        "pred_labels_from_search_with_seen_keys": [
            _pred(["s1"] * k), _pred(["s2"] * k)
        ],
        "pred_similarity_from_search_with_seen_keys": [[0.95] * k, [0.9] * k],
        "pred_labels_from_search_with_unseen_keys": [
            _pred(["wrong"] * k), _pred(["wrong"] * k)
        ],
        "gt_label": [_gt("s1"), _gt("s2")],
    }
    # unseen queries: primary wrong, sim low; fallback right
    unseen_data = {
        "pred_labels_from_search_with_seen_keys": [
            _pred(["bad"] * k), _pred(["bad"] * k)
        ],
        "pred_similarity_from_search_with_seen_keys": [[0.2] * k, [0.25] * k],
        "pred_labels_from_search_with_unseen_keys": [
            _pred(["u1"] * k), _pred(["u2"] * k)
        ],
        "gt_label": [_gt("u1"), _gt("u2")],
    }
    lines = []
    seen_out, unseen_out = method_1_eval(
        seen_data, unseen_data, k_list=[1, 3], num_intervals=101,
        out=lines.append,
    )
    assert 0.25 <= seen_out["best_threshold"] < 0.9
    assert seen_out["micro_acc"][1]["species"] == 1.0
    assert unseen_out["micro_acc"][1]["species"] == 1.0
    print_acc_for_google_doc(seen_out, unseen_out, k_list=[1, 3],
                             out=lines.append)
    assert any(" 1.0" in l for l in lines)


def test_class_averaged_embeddings_and_csv(tmp_path):
    feats = np.array(
        [[1, 0], [3, 0], [0, 2], [0, 4], [5, 5]], dtype=np.float32
    )
    labels = np.array([0, 0, 1, 1, 2])
    avg = class_averaged_embeddings(feats, labels)
    np.testing.assert_allclose(avg, [[2, 0], [0, 3], [5, 5]])

    dna_p, img_p = export_bzsl_csvs(
        str(tmp_path), feats, feats, labels, out=lambda s: None
    )
    dna = np.loadtxt(dna_p, delimiter=",")
    assert dna.shape == (2, 3)  # (dim, n_classes) transposed
    img = np.loadtxt(img_p, delimiter=",")
    assert img.shape == (2, 5)  # (dim, n_samples)


def test_flatten_csv(tmp_path):
    import csv

    from bioscan_clip_tpu.cli.flatten_csv import flatten

    fieldnames = [
        "learning_strategy", "Alignment", "Query", "Key", "Metric",
        "Seen_Order", "Seen_Family", "Seen_Genus", "Seen_Species",
        "Unseen_Order", "Unseen_Family", "Unseen_Genus", "Unseen_Species",
    ]
    rows = [
        {
            "learning_strategy": "LoRA", "Alignment": "I,D,T",
            "Query": "Image", "Key": "DNA", "Metric": "Micro_Top-1_acc",
            "Seen_Order": "0.98", "Seen_Family": "0.84", "Seen_Genus": "0.58",
            "Seen_Species": "0.42", "Unseen_Order": "0.97",
            "Unseen_Family": "0.79", "Unseen_Genus": "0.43",
            "Unseen_Species": "0.30",
        }
    ]
    out_rows, out_fields = flatten(rows, fieldnames)
    assert len(out_rows) == 8
    assert out_rows[0]["micro_macro"] == "Micro"
    assert out_rows[0]["top_k"] == "1"
    assert out_rows[0]["seen_unseen"] == "Seen"
    assert out_rows[0]["taxon"] == "Order"
    assert out_rows[0]["value"] == "0.98"
    assert out_rows[-1]["seen_unseen"] == "Unseen"
    assert out_rows[-1]["taxon"] == "Species"
