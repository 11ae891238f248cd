"""Method 1: seen/unseen routing by image->seen-image-key similarity
threshold, falling back to image->unseen-DNA-key retrieval.

Parity with scripts/method_one_eval.py (reimplemented working — the
reference has a broken import, SURVEY.md §4). Flow:
1. extract image features of seen/unseen queries;
2. retrieve against seen IMAGE keys (train_seen/seen_keys) -> predictions +
   similarities;
3. retrieve against unseen DNA keys (val+test unseen keys) -> fallback
   predictions;
4. grid-search the routing threshold on the harmonic mean of seen/unseen
   species top-1 micro accuracy; report final accuracies.
"""

from __future__ import annotations

import sys

import numpy as np


def _query_data(model, params, mesh, query_loader, seen_key_dicts,
                unseen_key_dicts, extract_features, make_prediction):
    q = extract_features(params, model, mesh, query_loader)
    seen_keys_feat = np.concatenate(
        [d["encoded_image_feature"] for d in seen_key_dicts], axis=0
    )
    seen_keys_labels = sum((d["label_list"] for d in seen_key_dicts), [])
    unseen_keys_feat = np.concatenate(
        [d["encoded_dna_feature"] for d in unseen_key_dicts], axis=0
    )
    unseen_keys_labels = sum((d["label_list"] for d in unseen_key_dicts), [])

    pred_seen, sim_seen = make_prediction(
        q["encoded_image_feature"], seen_keys_feat, seen_keys_labels,
        with_similarity=True, max_k=5,
    )
    pred_unseen = make_prediction(
        q["encoded_image_feature"], unseen_keys_feat, unseen_keys_labels,
        max_k=5,
    )
    return {
        "pred_labels_from_search_with_seen_keys": pred_seen,
        "pred_similarity_from_search_with_seen_keys": sim_seen.tolist(),
        "pred_labels_from_search_with_unseen_keys": pred_unseen,
        "gt_label": q["label_list"],
    }


def run(args, out=print, searched_threshold=None, num_intervals=1000):
    import jax
    import jax.numpy as jnp

    from bioscan_clip_tpu.data.dataset import (
        load_bioscan_dataloader_with_train_seen_and_separate_keys,
    )
    from bioscan_clip_tpu.models.clip import init_clip_params, load_clip_model
    from bioscan_clip_tpu.parallel.mesh import create_mesh
    from bioscan_clip_tpu.retrieval.engine import make_prediction
    from bioscan_clip_tpu.retrieval.methods import (
        method_1_eval,
        print_acc_for_google_doc,
    )
    from bioscan_clip_tpu.train.checkpoint import (
        load_pth_into_params,
        resolve_reference_ckpt,
    )
    from bioscan_clip_tpu.train.loop import extract_features
    import os

    mc = args.model_config
    mc.batch_size = 40  # (method_one_eval.py:295)
    k_list = list(args.inference_and_eval_setting.k_list)

    out("Construct dataloader...")
    (train_seen, seen_val, unseen_val, seen_keys, val_unseen_keys,
     test_unseen_keys) = (
        load_bioscan_dataloader_with_train_seen_and_separate_keys(args)
    )

    out("Initialize model...")
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = load_clip_model(args, dtype=dtype)
    params = init_clip_params(model, jax.random.PRNGKey(0))
    ckpt = getattr(mc, "ckpt_path", None)
    if ckpt and os.path.isdir(ckpt):
        ckpt = resolve_reference_ckpt(ckpt)
    if ckpt and os.path.isfile(ckpt):
        params = load_pth_into_params(ckpt, params, mc.output_dim)
        out(f"Loaded {ckpt}")

    mesh = create_mesh()
    seen_keys_dict = extract_features(params, model, mesh, seen_keys)
    vu_keys_dict = extract_features(params, model, mesh, val_unseen_keys)
    tu_keys_dict = extract_features(params, model, mesh, test_unseen_keys)

    seen_query_data = _query_data(
        model, params, mesh, seen_val, [seen_keys_dict],
        [vu_keys_dict, tu_keys_dict], extract_features, make_prediction,
    )
    unseen_query_data = _query_data(
        model, params, mesh, unseen_val, [seen_keys_dict],
        [vu_keys_dict, tu_keys_dict], extract_features, make_prediction,
    )

    out("Searching best threshold.")
    seen_out, unseen_out = method_1_eval(
        seen_query_data, unseen_query_data, k_list=k_list,
        searched_threshold=searched_threshold, num_intervals=num_intervals,
        out=out,
    )
    print_acc_for_google_doc(seen_out, unseen_out, k_list=k_list, out=out)
    return seen_out, unseen_out


def main(argv=None):
    from bioscan_clip_tpu.config.core import load_config

    args = load_config(
        overrides=list(argv if argv is not None else sys.argv[1:])
    )
    return run(args)


if __name__ == "__main__":
    main()
