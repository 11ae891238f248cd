"""Method 2: train a seen-species classifier head on the image encoder,
route by classifier confidence vs image->unseen-DNA-key retrieval.

Parity with scripts/method_two_fine_tuning_and_eval.py (reimplemented
working — the reference import is broken, SURVEY.md §4):
1. build species->taxonomy map + species index from the train_seen labels
   (:290-316);
2. fine-tune a classifier (image encoder + linear head, :459-470);
3. classifier top-5 softmax confidences + species->4-level predictions
   (:39-84);
4. fallback retrieval against unseen DNA keys; threshold routing searched
   on harmonic mean (same machinery as method 1).
"""

from __future__ import annotations

import os
import sys

import numpy as np


def load_all_seen_species_name_and_create_label_map(train_seen_loader):
    """(species->idx dict, idx->4-level-labels dict) from the seen split
    (method_two_fine_tuning_and_eval.py:290-316)."""
    species_to_other = {}
    for batch in train_seen_loader:
        for d in batch["label_dicts"]:
            if d["species"] not in species_to_other:
                species_to_other[d["species"]] = {
                    "order": d["order"],
                    "family": d["family"],
                    "genus": d["genus"],
                }
    species_to_idx = {}
    idx_to_all = {}
    for idx, sp in enumerate(species_to_other):
        species_to_idx[sp] = idx
        idx_to_all[idx] = {"species": sp, **species_to_other[sp]}
    return species_to_idx, idx_to_all


def classifier_predictions(params, clf, mesh, loader, idx_to_all,
                           openclip_norm=False):
    """Top-5 softmax confidences + 4-level label predictions + gt labels."""
    import jax
    import jax.numpy as jnp

    from bioscan_clip_tpu.data.transforms import eval_transform_auto
    from bioscan_clip_tpu.parallel.mesh import shard_batch_padded

    @jax.jit
    def infer(params, x):
        if x.dtype == jnp.uint8:
            x = eval_transform_auto(x, normalize=openclip_norm)
        logits = clf.apply({"params": params}, x, deterministic=True)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jax.lax.top_k(probs, 5)

    confidences, indices, gt = [], [], []
    for batch in loader:
        xs, n = shard_batch_padded(
            batch.get("image_u8", batch.get("image")), mesh
        )
        vals, idxs = infer(params, xs)
        confidences.append(np.asarray(vals)[:n])
        indices.append(np.asarray(idxs)[:n])
        gt.extend(batch["label_dicts"])
    confidences = np.concatenate(confidences, axis=0)
    indices = np.concatenate(indices, axis=0)

    pred_labels = []
    for row in indices:
        pred = {lvl: [] for lvl in ("order", "family", "genus", "species")}
        for idx in row:
            info = idx_to_all[int(idx)]
            for lvl in pred:
                pred[lvl].append(info[lvl])
        pred_labels.append(pred)
    return confidences.tolist(), pred_labels, gt


def run(args, out=print, fine_tune_epochs=None, searched_threshold=None,
        num_intervals=1000):
    import jax
    import jax.numpy as jnp
    import optax

    from bioscan_clip_tpu.data.dataset import (
        load_bioscan_dataloader_with_train_seen_and_separate_keys,
    )
    from bioscan_clip_tpu.models.clip import init_clip_params, load_clip_model
    from bioscan_clip_tpu.models.heads import EncoderWithHead
    from bioscan_clip_tpu.parallel.mesh import create_mesh, shard_batch
    from bioscan_clip_tpu.retrieval.engine import make_prediction
    from bioscan_clip_tpu.retrieval.methods import (
        get_final_pred_and_acc,
        print_acc_for_google_doc,
        search_threshold_with_harmonic_mean,
    )
    from bioscan_clip_tpu.train.checkpoint import (
        load_pth_into_params,
        resolve_reference_ckpt,
    )
    from bioscan_clip_tpu.train.fine_tuning import (
        label_batch_to_species_idx,
        make_classifier_train_step,
    )
    from bioscan_clip_tpu.train.loop import extract_features
    from bioscan_clip_tpu.train.state import TrainState

    mc = args.model_config
    mc.batch_size = 40
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

    species_to_idx, idx_to_all = (
        load_all_seen_species_name_and_create_label_map(train_seen)
    )
    unique_species = list(species_to_idx.keys())
    out(f"{len(unique_species)}-way classifier")

    clf = EncoderWithHead(model.image_encoder, len(unique_species), dtype=dtype)
    mesh = create_mesh()
    clf_params = clf.init(jax.random.PRNGKey(1), jnp.zeros((2, 224, 224, 3)))[
        "params"
    ]
    clf_params["encoder"] = params["image_encoder"]
    tx = optax.adamw(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=clf_params,
        opt_state=tx.init(clf_params), tx=tx, apply_fn=None,
    )
    step = make_classifier_train_step(clf, mesh, modality="image")
    rng = jax.random.PRNGKey(2)

    out("fine-tuning classifier head...")
    epochs = fine_tune_epochs if fine_tune_epochs is not None else 5
    for epoch in range(epochs):
        losses = []
        for batch in train_seen:
            db = shard_batch(
                {
                    "input": batch["image_u8"],
                    "target": label_batch_to_species_idx(
                        batch["label_dicts"], unique_species
                    ),
                },
                mesh,
            )
            state, loss = step(state, db, rng)
            losses.append(float(loss))
        out(f"epoch {epoch}: loss {np.mean(losses):.4f}")

    # classifier-confidence branch
    seen_conf, seen_pred_a, seen_gt = classifier_predictions(
        state.params, clf, mesh, seen_val, idx_to_all
    )
    unseen_conf, unseen_pred_a, unseen_gt = classifier_predictions(
        state.params, clf, mesh, unseen_val, idx_to_all
    )

    # DNA-retrieval fallback branch
    vu = extract_features(params, model, mesh, val_unseen_keys)
    tu = extract_features(params, model, mesh, test_unseen_keys)
    unseen_keys_feat = np.concatenate(
        [vu["encoded_dna_feature"], tu["encoded_dna_feature"]], axis=0
    )
    unseen_keys_labels = vu["label_list"] + tu["label_list"]
    seen_q = extract_features(params, model, mesh, seen_val)
    unseen_q = extract_features(params, model, mesh, unseen_val)
    seen_pred_b = make_prediction(
        seen_q["encoded_image_feature"], unseen_keys_feat,
        unseen_keys_labels, max_k=5,
    )
    unseen_pred_b = make_prediction(
        unseen_q["encoded_image_feature"], unseen_keys_feat,
        unseen_keys_labels, max_k=5,
    )

    splits = [
        {
            "pred_labels_from_search_with_seen_keys": seen_pred_a,
            "pred_similarity_from_search_with_seen_keys": seen_conf,
            "pred_labels_from_search_with_unseen_keys": seen_pred_b,
            "gt_label": seen_gt,
        },
        {
            "pred_labels_from_search_with_seen_keys": unseen_pred_a,
            "pred_similarity_from_search_with_seen_keys": unseen_conf,
            "pred_labels_from_search_with_unseen_keys": unseen_pred_b,
            "gt_label": unseen_gt,
        },
    ]
    if searched_threshold is None:
        searched_threshold = search_threshold_with_harmonic_mean(
            splits, k_list=k_list, num_intervals=num_intervals, out=out
        )
    seen_out = get_final_pred_and_acc(
        seen_pred_a, seen_conf, seen_pred_b, seen_gt,
        best_threshold=searched_threshold, k_list=k_list,
    )
    unseen_out = get_final_pred_and_acc(
        unseen_pred_a, unseen_conf, unseen_pred_b, unseen_gt,
        best_threshold=searched_threshold, k_list=k_list,
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
