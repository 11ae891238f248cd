"""Joint image+DNA supervised fine-tune of a BIOSCAN-CLIP model on INSECT,
with per-eval BZSL CSV export.

Parity with scripts/supervised_fine_tune_bioscan_clip_model_on_insect.py:
EncoderWithHead classifiers over both towers, summed CE (AdamW lr 1e-3,
fully trainable), trainval loader, periodic top-k eval on test_seen and
class-averaged DNA + per-sample image CSV export.
"""

from __future__ import annotations

import datetime
import os
import sys

import numpy as np


def run(args, max_epochs=None, out=print):
    import jax
    import jax.numpy as jnp

    from bioscan_clip_tpu.data.insect import (
        load_insect_dataloader,
        load_insect_dataloader_trainval,
    )
    from bioscan_clip_tpu.models.clip import init_clip_params, load_clip_model
    from bioscan_clip_tpu.models.heads import EncoderWithHead
    from bioscan_clip_tpu.parallel.mesh import create_mesh, shard_batch
    from bioscan_clip_tpu.retrieval.bzsl import (
        export_bzsl_csvs,
        res101_class_labels,
    )
    from bioscan_clip_tpu.train.checkpoint import (
        load_pth_into_params,
        save_params_only,
    )
    from bioscan_clip_tpu.train.fine_tuning import (
        evaluate_classifier,
        get_all_unique_species_from_loader,
        label_batch_to_species_idx,
        make_joint_classifier_train_step,
    )
    from bioscan_clip_tpu.train.loop import extract_features
    from bioscan_clip_tpu.train.state import TrainState
    import optax

    mc = args.model_config
    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H%M%S")

    out("Construct dataloaders...")
    (train_loader, train_for_key, val_loader, test_seen_loader,
     test_unseen_loader) = load_insect_dataloader(args)
    trainval_loader = load_insect_dataloader_trainval(args)
    all_loader = load_insect_dataloader(args, load_all_in_one=True)

    unique_species = get_all_unique_species_from_loader(train_for_key)
    n_classes = len(unique_species)
    out(f"{n_classes} seen species classes")

    out("Initialize model...")
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    clip = load_clip_model(args, dtype=dtype)
    clip_params = init_clip_params(clip, jax.random.PRNGKey(0))
    ckpt = getattr(mc, "ckpt_path", None)
    if ckpt and os.path.isfile(ckpt):
        clip_params = load_pth_into_params(ckpt, clip_params, mc.output_dim)
        out(f"Loaded {ckpt}")

    image_clf = EncoderWithHead(clip.image_encoder, n_classes, dtype=dtype)
    dna_clf = EncoderWithHead(clip.dna_encoder, n_classes, dtype=dtype)
    mesh = create_mesh()

    img_p = image_clf.init(
        jax.random.PRNGKey(1), jnp.zeros((2, 224, 224, 3))
    )["params"]
    dna_p = dna_clf.init(
        jax.random.PRNGKey(2), jnp.zeros((2, 133), jnp.int32)
    )["params"]
    img_p["encoder"] = clip_params["image_encoder"]
    dna_p["encoder"] = clip_params["dna_encoder"]
    params = {"image": img_p, "dna": dna_p}

    # fully trainable joint fine-tune (reference unfreezes everything)
    tx = optax.adamw(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx, apply_fn=None,
    )
    step = make_joint_classifier_train_step(image_clf, dna_clf, mesh)

    folder = os.path.join(
        args.project_root_path, args.model_output_dir,
        "supervised_fine_tune_bioscan_clip_model_on_insect", stamp,
    )
    epochs = max_epochs or args.general_fine_tune_setting.epoch
    rng = jax.random.PRNGKey(3)
    out("training...")
    for epoch in range(epochs):
        losses = []
        for batch in trainval_loader:
            # training batches carry instance labels (= row indices); map
            # them back to species targets via the loader's label dicts
            db = {
                "image": batch["image_u8"],
                "dna": batch["dna"],
                "target": label_batch_to_species_idx(
                    [
                        trainval_loader.label_dicts[int(l)]
                        for l in batch["labels"]
                    ],
                    unique_species,
                ),
            }
            db = shard_batch(db, mesh)
            state, loss = step(state, db, rng)
            losses.append(float(loss))
        out(f"epoch {epoch}: loss {np.mean(losses):.4f}")

        if epoch % mc.evaluation_period == 0 or epoch == epochs - 1:
            img_acc = evaluate_classifier(
                state.params["image"], image_clf, mesh, test_seen_loader,
                unique_species, modality="image",
            )
            dna_acc = evaluate_classifier(
                state.params["dna"], dna_clf, mesh, test_seen_loader,
                unique_species, modality="dna",
            )
            out(f"Image Evaluation Result: {img_acc}")
            out(f"DNA Evaluation Result: {dna_acc}")
            if args.save_ckpt:
                os.makedirs(folder, exist_ok=True)
                save_params_only(folder, state.params, name="joint_last")
                # BZSL CSV export with the fine-tuned towers
                clip_params["image_encoder"] = state.params["image"]["encoder"]
                clip_params["dna_encoder"] = state.params["dna"]["encoder"]
                feats = extract_features(clip_params, clip, mesh, all_loader)
                labels = res101_class_labels(
                    args.insect_data.path_to_res_101_mat
                )
                embed_dir = os.path.join(
                    args.project_root_path,
                    "embedding_from_bsc_fine_tuned_on_insect", stamp,
                )
                export_bzsl_csvs(
                    embed_dir, feats["encoded_dna_feature"],
                    feats["encoded_image_feature"], labels, out=out,
                )
    return state


def main(argv=None):
    from bioscan_clip_tpu.config.core import load_config

    args = load_config(
        overrides=list(argv if argv is not None else sys.argv[1:])
    )
    return run(args)


if __name__ == "__main__":
    main()
