"""Full ViT-B supervised fine-tune on INSECT -> image embedding CSV for BZSL.

Parity with scripts/fine_tune_vitb_on_insect.py (reimplemented working —
the reference imports a nonexistent `ViTWIthExtraLayer`, SURVEY.md §4):
fresh timm-geometry ViT-B with a classification layer, fully trainable,
bs 200 x 500 epochs (general_fine_tune_setting), AdamW 1e-3; exports the
per-sample image embedding CSV.
"""

from __future__ import annotations

import datetime
import os
import sys

import numpy as np


def run(args, max_epochs=None, out=print):
    import jax
    import jax.numpy as jnp
    import optax

    from bioscan_clip_tpu.data.insect import (
        load_insect_dataloader,
        load_insect_dataloader_trainval,
    )
    from bioscan_clip_tpu.models.heads import EncoderWithHead
    from bioscan_clip_tpu.models.vit import ViT, ViTConfig
    from bioscan_clip_tpu.parallel.mesh import create_mesh, shard_batch
    from bioscan_clip_tpu.train.fine_tuning import (
        evaluate_classifier,
        get_all_unique_species_from_loader,
        label_batch_to_species_idx,
        make_classifier_train_step,
    )
    from bioscan_clip_tpu.train.state import TrainState

    mc = args.model_config
    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H%M%S")
    mc.batch_size = args.general_fine_tune_setting.batch_size

    (train_loader, train_for_key, val_loader, test_seen_loader,
     test_unseen_loader) = load_insect_dataloader(args)
    trainval_loader = load_insect_dataloader_trainval(args)
    all_loader = load_insect_dataloader(args, load_all_in_one=True)
    unique_species = get_all_unique_species_from_loader(train_for_key)

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    vit = ViT(
        ViTConfig(num_classes=mc.output_dim, lora_rank=0), dtype=dtype
    )
    clf = EncoderWithHead(vit, len(unique_species), dtype=dtype)
    mesh = create_mesh()
    params = clf.init(jax.random.PRNGKey(0), jnp.zeros((2, 224, 224, 3)))[
        "params"
    ]
    tx = optax.adamw(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx, apply_fn=None,
    )
    step = make_classifier_train_step(clf, mesh, modality="image")
    rng = jax.random.PRNGKey(1)

    epochs = max_epochs or args.general_fine_tune_setting.epoch
    for epoch in range(epochs):
        losses = []
        for batch in trainval_loader:
            db = shard_batch(
                {
                    "input": batch["image_u8"],
                    "target": label_batch_to_species_idx(
                        [
                            trainval_loader.label_dicts[int(l)]
                            for l in batch["labels"]
                        ],
                        unique_species,
                    ),
                },
                mesh,
            )
            state, loss = step(state, db, rng)
            losses.append(float(loss))
        out(f"epoch {epoch}: loss {np.mean(losses):.4f}")
        if epoch % mc.evaluation_period == 0 or epoch == epochs - 1:
            acc = evaluate_classifier(
                state.params, clf, mesh, test_seen_loader, unique_species,
                modality="image",
            )
            out(f"Evaluation Result: {acc}")

    # export per-sample image embeddings (pre-head features)
    from bioscan_clip_tpu.data.transforms import eval_transform_auto

    @jax.jit
    def feat(params, x):
        if x.dtype == jnp.uint8:
            x = eval_transform_auto(x)
        return clf.apply(
            {"params": params}, x, deterministic=True,
            method=clf.get_feature,
        )

    feats = []
    for batch in all_loader:
        feats.append(np.asarray(feat(
            state.params, batch.get("image_u8", batch.get("image"))
        )))
    image_feature = np.concatenate(feats, axis=0).astype(np.float32)
    folder = os.path.join(
        args.project_root_path, "embedding_from_vitb_fine_tuned_on_insect",
        stamp,
    )
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, "image_embedding_from_fine_tuned_vit.csv")
    np.savetxt(path, image_feature.T, delimiter=",")
    out(f"{path} {image_feature.T.shape}")
    return state


def main(argv=None):
    from bioscan_clip_tpu.config.core import load_config

    args = load_config(
        overrides=list(argv if argv is not None else sys.argv[1:])
    )
    return run(args)


if __name__ == "__main__":
    main()
