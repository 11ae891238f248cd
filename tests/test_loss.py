"""Loss parity vs the torch reference semantics + multi-positive behavior."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from bioscan_clip_tpu.losses.contrastive import (
    construct_label_matrix,
    multimodal_contrastive_loss,
    soft_cross_entropy,
)


def _torch_reference_loss(feature_list, labels, logit_scale):
    """Verbatim semantics of ContrastiveLoss.forward (loss_func.py:29-54)."""
    import torch.nn.functional as F

    criterion = torch.nn.CrossEntropyLoss()
    label = (labels.unsqueeze(0) == labels.unsqueeze(1)).float()
    loss_list = []
    for ia, fa in enumerate(feature_list):
        for ib, fb in enumerate(feature_list):
            if ia == ib:
                continue
            fa_n = F.normalize(fa, p=2, dim=1)
            fb_n = F.normalize(fb, p=2, dim=1)
            sim_ab = logit_scale * fa_n @ fb_n.T
            sim_ba = logit_scale * fb_n @ fa_n.T
            loss_list.append(criterion(sim_ab, label))
            loss_list.append(criterion(sim_ba, label))
    return (sum(loss_list) / len(loss_list)).item()


@pytest.mark.parametrize("n_modalities", [2, 3])
@pytest.mark.parametrize("multi_positive", [False, True])
def test_loss_parity_with_torch(n_modalities, multi_positive):
    rng = np.random.default_rng(0)
    B, D = 16, 32
    feats = [rng.standard_normal((B, D)).astype(np.float32) for _ in range(n_modalities)]
    if multi_positive:
        labels = rng.integers(0, 5, size=(B,))  # BIN-style group labels
    else:
        labels = np.arange(B)  # instance labels (dataset.py:147)

    ref = _torch_reference_loss(
        [torch.tensor(f) for f in feats], torch.tensor(labels), 1 / 0.07
    )
    names = ["image", "dna", "language"][:n_modalities]
    ours = float(
        multimodal_contrastive_loss(
            {n: jnp.asarray(f) for n, f in zip(names, feats)},
            jnp.asarray(labels),
            1 / 0.07,
        )
    )
    assert ours == pytest.approx(ref, rel=1e-5)


def test_loss_requires_two_modalities():
    with pytest.raises(ValueError):
        multimodal_contrastive_loss(
            {"image": jnp.ones((4, 8)), "dna": None, "language": None},
            jnp.arange(4),
        )


def test_soft_ce_unnormalized_targets():
    """torch CE with prob targets does not normalize rows — groups of k
    positives scale the row loss by k."""
    logits = torch.tensor(np.random.default_rng(1).standard_normal((4, 4)), dtype=torch.float32)
    target = torch.zeros(4, 4)
    target[0, :2] = 1.0  # row with 2 positives, sums to 2
    target[1, 1] = 1.0
    target[2, 2] = 1.0
    target[3, 3] = 1.0
    ref = torch.nn.CrossEntropyLoss()(logits, target).item()
    ours = float(soft_cross_entropy(jnp.asarray(logits.numpy()), jnp.asarray(target.numpy())))
    assert ours == pytest.approx(ref, rel=1e-6)


def test_label_matrix():
    m = construct_label_matrix(jnp.asarray([1, 2, 1]))
    np.testing.assert_array_equal(
        np.asarray(m), [[1, 0, 1], [0, 1, 0], [1, 0, 1]]
    )
