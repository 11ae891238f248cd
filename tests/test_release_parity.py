"""STANDING release-parity gate (VERDICT r1 item 10; BASELINE.md:62).

Skipped unless real artifacts are provided via env vars — the CI container
has neither the released checkpoints nor the 80 GB HDF5s. The moment they
are available, run:

    BIOSCAN_CLIP_CKPT=/path/to/best.pth \
    BIOSCAN_CLIP_HDF5=/path/to/BIOSCAN_1M.hdf5 \
    [BIOSCAN_CLIP_EMB=/path/to/extracted_feature_from_val_split.hdf5] \
    python -m pytest tests/test_release_parity.py -v

Gates:
1. embedding parity — if BIOSCAN_CLIP_EMB is given, per-record cosine
   similarity between our embeddings and the released ones must exceed
   0.999 (converter bit-fidelity, SURVEY.md §7 hard part 1);
2. retrieval parity — image→DNA species top-1 micro accuracy on the val
   split must match the published table (BASELINE.md: seen 42.0 /
   unseen 30.1) within 0.1 percentage points.
"""

import os

import numpy as np
import pytest

CKPT = os.environ.get("BIOSCAN_CLIP_CKPT")
HDF5 = os.environ.get("BIOSCAN_CLIP_HDF5")
EMB = os.environ.get("BIOSCAN_CLIP_EMB")

pytestmark = pytest.mark.skipif(
    not (CKPT and os.path.isfile(CKPT) and HDF5 and os.path.isfile(HDF5)),
    reason="released artifacts not present (set BIOSCAN_CLIP_CKPT + "
    "BIOSCAN_CLIP_HDF5 to run the standing parity gate)",
)

# published val-split numbers (BASELINE.md, I+D+T row): image query ->
# DNA key, species top-1 micro
PUBLISHED = {"seen": 42.0, "unseen": 30.1}
TOL_PP = 0.1  # percentage points (BASELINE.md:62)


def _model_and_params():
    import jax
    import jax.numpy as jnp

    from bioscan_clip_tpu.config.core import ConfigNode
    from bioscan_clip_tpu.models.clip import init_clip_params, load_clip_model
    from bioscan_clip_tpu.train.checkpoint import load_pth_into_params

    args = ConfigNode(
        {
            "model_config": {
                "output_dim": 768,
                "image": {"input_type": "image", "model": "lora_vit"},
                "dna": {"input_type": "sequence", "model": "lora_barcode_bert"},
                "language": {"input_type": "sequence", "model": "lora_bert"},
            }
        }
    )
    dtype = jnp.float32  # parity gate runs in fp32
    model = load_clip_model(args, dtype=dtype)
    params = init_clip_params(model, jax.random.PRNGKey(0))
    params = load_pth_into_params(CKPT, params, output_dim=768)
    return model, params


def _extract(model, params, split, batch_size=24):
    from bioscan_clip_tpu.data.pipeline import BioscanLoader
    from bioscan_clip_tpu.parallel.mesh import create_mesh
    from bioscan_clip_tpu.train.loop import extract_features

    mesh = create_mesh()
    loader = BioscanLoader(HDF5, split, batch_size=batch_size)
    return extract_features(params, model, mesh, loader)


@pytest.mark.skipif(
    not (EMB and os.path.isfile(EMB)),
    reason="released embedding HDF5 not provided (BIOSCAN_CLIP_EMB)",
)
def test_released_embedding_cosine_parity():
    import h5py

    model, params = _model_and_params()
    ours = _extract(model, params, "val_seen")
    with h5py.File(EMB, "r") as f:
        theirs = np.asarray(f["seen"]["encoded_image_feature"])
    n = min(len(theirs), len(ours["encoded_image_feature"]))
    a = np.asarray(ours["encoded_image_feature"][:n], np.float64)
    b = np.asarray(theirs[:n], np.float64)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    cos = (a * b).sum(axis=1)
    assert float(np.median(cos)) > 0.999, (
        f"median cosine {np.median(cos):.5f} — converter fidelity broken"
    )


def test_published_retrieval_accuracy():
    from bioscan_clip_tpu.parallel.mesh import create_mesh
    from bioscan_clip_tpu.retrieval.report import inference_and_print_result

    model, params = _model_and_params()
    keys = _extract(model, params, "all_keys")
    seen = _extract(model, params, "val_seen")
    unseen = _extract(model, params, "val_unseen")
    acc, _, _ = inference_and_print_result(
        keys, seen, unseen, k_list=[1], mesh=create_mesh(),
        out=lambda *a: None,
    )
    got = {
        split: 100.0
        * acc["encoded_image_feature"]["encoded_dna_feature"][split][
            "micro_acc"
        ][1]["species"]
        for split in ("seen", "unseen")
    }
    for split, want in PUBLISHED.items():
        assert abs(got[split] - want) <= TOL_PP, (
            f"{split}: got {got[split]:.2f}%, published {want}% "
            f"(tolerance {TOL_PP} pp)"
        )
