"""Supervised species-classification fine-tuning.

Parity with bioscanclip/epoch/fine_tuning_epoch.py:
- `label_batch_to_species_idx`: species string -> index into the unique-seen
  species list (:6-9);
- single-modality fine-tune step (CE on classifier logits, :11-37);
- joint image+dna (two classifiers, summed CE, :77-103);
- `evaluate_classifier`: top-k by argsort over logits (:39-75).

All steps are jitted over the mesh with batch sharded on `data`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bioscan_clip_tpu.parallel.mesh import replicated, shard_batch_padded


def label_batch_to_species_idx(label_dicts, unique_species_for_seen):
    index = {s: i for i, s in enumerate(unique_species_for_seen)}
    return np.asarray(
        [index[d["species"]] for d in label_dicts], dtype=np.int64
    )


def make_classifier_train_step(model, mesh, modality: str = "image",
                               openclip_norm: bool = False):
    """CE fine-tune step for an EncoderWithHead on one modality."""
    from bioscan_clip_tpu.data.transforms import train_transform

    def loss_fn(params, batch, rng):
        x = batch["input"]
        if modality == "image" and x.dtype == jnp.uint8:
            aug_rng, rng = jax.random.split(rng)
            x = train_transform(x, aug_rng, normalize=openclip_norm)
        logits = model.apply(
            {"params": params}, x, deterministic=False,
            rngs={"dropout": rng},
        )
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), batch["target"]
        ).mean()

    @functools.partial(
        jax.jit, donate_argnums=(0,),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )
    def step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        return state.apply_gradients(grads), loss

    return step


def make_joint_classifier_train_step(image_model, dna_model, mesh,
                                     openclip_norm: bool = False):
    """Joint image+dna fine-tune: two classifiers, summed CE
    (fine_tuning_epoch.py:77-103). `state.params` = {"image": ..., "dna": ...}.
    """
    from bioscan_clip_tpu.data.transforms import train_transform

    def loss_fn(params, batch, rng):
        aug_rng, di_rng, dd_rng = jax.random.split(rng, 3)
        img = batch["image"]
        if img.dtype == jnp.uint8:
            img = train_transform(img, aug_rng, normalize=openclip_norm)
        logits_i = image_model.apply(
            {"params": params["image"]}, img, deterministic=False,
            rngs={"dropout": di_rng},
        )
        logits_d = dna_model.apply(
            {"params": params["dna"]}, batch["dna"], deterministic=False,
            rngs={"dropout": dd_rng},
        )
        ce = optax.softmax_cross_entropy_with_integer_labels
        t = batch["target"]
        return (
            ce(logits_i.astype(jnp.float32), t).mean()
            + ce(logits_d.astype(jnp.float32), t).mean()
        )

    @functools.partial(
        jax.jit, donate_argnums=(0,),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )
    def step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        return state.apply_gradients(grads), loss

    return step


def evaluate_classifier(
    params, model, mesh, dataloader, unique_species_for_seen,
    k_values=None, modality: str = "image", openclip_norm: bool = False,
):
    """Top-k accuracy by argsort over classifier outputs
    (fine_tuning_epoch.py:39-75)."""
    from bioscan_clip_tpu.data.transforms import eval_transform_auto

    k_values = k_values or [1, 3, 5]
    max_k = min(max(k_values), len(unique_species_for_seen))

    @jax.jit
    def infer(params, x):
        if modality == "image" and x.dtype == jnp.uint8:
            # auto: eval_host_crop loaders ship pre-cropped (224, 224)
            # frames — the shape-inferred pre_cropped path keeps them
            # bit-identical instead of upscale-recropping (ADVICE r4 high)
            x = eval_transform_auto(x, normalize=openclip_norm)
        logits = model.apply({"params": params}, x, deterministic=True)
        return jax.lax.top_k(logits.astype(jnp.float32), max_k)[1]

    all_targets, all_preds = [], []
    for batch in dataloader:
        target = label_batch_to_species_idx(
            batch["label_dicts"], unique_species_for_seen
        )
        # eval loaders ship either raw uint8 (device transform applies in
        # `infer`) or host-parity float32 224² under "image"
        x = (
            batch.get("image_u8", batch.get("image"))
            if modality == "image" else batch["dna"]
        )
        xs, n = shard_batch_padded(x, mesh)
        preds = np.asarray(infer(params, xs))[:n]
        all_targets.append(target)
        all_preds.append(preds)
    targets = np.concatenate(all_targets)
    preds = np.concatenate(all_preds)
    return {
        f"top{k}_accuracy": float(
            (preds[:, :k] == targets[:, None]).any(axis=1).mean()
        )
        for k in k_values
    }


def get_all_unique_species_from_loader(dataloader) -> list:
    """Unique species in a loader (method_one_eval.py:160-167 semantics —
    but deterministic first-appearance order instead of python set order,
    so fine-tuned checkpoints are reproducible)."""
    seen = []
    seen_set = set()
    for batch in dataloader:
        for d in batch["label_dicts"]:
            s = d["species"]
            if s not in seen_set:
                seen_set.add(s)
                seen.append(s)
    return seen
