"""Multimodal soft-label InfoNCE (the reference's ContrastiveLoss/ClipLoss).

Parity target (bioscanclip/model/loss_func.py:18-54, 94-165):
- soft target matrix label[i,j] = float(labels_i == labels_j) —
  `construct_label_metrix` (loss_func.py:18-21). With instance labels
  (arange) this is the identity = standard InfoNCE; with BIN labels it is
  multi-positive.
- for every ordered pair (a, b) of present modalities, both directions of
  cross-entropy with the probability-matrix target are accumulated and the
  mean over all terms is returned (loss_func.py:39-54). torch CE with
  prob targets does NOT row-normalize the target: loss_row =
  -sum_j target[j] * log_softmax(logits)[j]; we replicate that exactly.
- features are L2-normalized inside the loss; logit scale fixed 1/0.07
  (train_cl.py:190).

TPU-native global batch: there is no separate "gathered" implementation.
The train step is jit'ed over a `jax.sharding.Mesh` with the batch sharded
on the `data` axis and params replicated; writing the loss on the global
(logical) batch makes XLA all-gather the (B, D) embeddings over ICI and
differentiate through the collective automatically — the semantics of
`ClipLoss(gather_with_grad=True)` (loss_func.py:58-91, 117-136) without any
hand-written communication, and it *fixes* the reference's missing gradient
synchronization (SURVEY.md §2.8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def construct_label_matrix(labels):
    """(B,) int labels -> (B, B) float32 equality matrix (loss_func.py:18-21)."""
    return (labels[None, :] == labels[:, None]).astype(jnp.float32)


def soft_cross_entropy(logits, target_probs):
    """torch nn.CrossEntropyLoss(probabilities-target) parity:
    mean over rows of -sum_j target[j] * log_softmax(logits)[j].
    Computed in fp32 regardless of input dtype."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(target_probs * logp).sum(axis=-1).mean()


def multimodal_contrastive_loss(
    embeddings: dict,
    labels,
    logit_scale: float = 1.0 / 0.07,
    label_matrix=None,
):
    """Mean pairwise soft-label InfoNCE over all ordered modality pairs.

    embeddings: {modality_name: (B, D) array or None}. At least two present.
    labels: (B,) int array (instance ids or BIN group ids).

    The reference's loop appends both CE(sim_ab) and CE(sim_ba) for every
    ordered pair, so each direction is counted twice; the *mean* is
    therefore identical to the mean over unique directions, which is what
    we compute (half the FLOPs, same value).
    """
    feats = [e for e in embeddings.values() if e is not None]
    if len(feats) < 2:
        raise ValueError("Too less element for calculating the contrastive loss.")
    if label_matrix is None:
        label_matrix = construct_label_matrix(labels)

    # normalize (idempotent if the model already normalized)
    feats = [
        f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
        for f in feats
    ]

    terms = []
    for i, a in enumerate(feats):
        for j, b in enumerate(feats):
            if i == j:
                continue
            sim = logit_scale * jnp.dot(
                a, b.T, preferred_element_type=jnp.float32
            )
            terms.append(soft_cross_entropy(sim, label_matrix))
    return sum(terms) / len(terms)
