"""Per-layer remat (ViTConfig/BertConfig/OpenClip*Config.remat) must be a
pure memory/compute trade: identical parameter tree, identical forward
(including dropout masks under the same rng), identical gradients.

The knob exists because the train-step backward otherwise saves every
scanned layer's activations (measured 24.1G HBM at B=128 on v5e —
PERF_NOTES.md round 2)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bioscan_clip_tpu.models.bert import BertConfig, BertTextEncoder
from bioscan_clip_tpu.models.vit import ViT, ViTConfig


def tree_max_diff(a, b):
    return max(
        float(jnp.abs(x - y).max())
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


@pytest.mark.parametrize(
    "policy", ["full", "dots", "narrow", "wide", "dots_act"]
)
@pytest.mark.parametrize("tower", ["vit", "bert"])
def test_remat_identical_params_forward_grads(tower, policy):
    if tower == "vit":
        cfg = ViTConfig(
            image_size=32, patch_size=16, hidden_size=32, num_layers=2,
            num_heads=4, num_classes=16, lora_rank=2, dropout=0.1,
        )
        make = lambda r: ViT(
            dataclasses.replace(cfg, remat=r, remat_policy=policy)
        )
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
            jnp.float32,
        )
        apply = lambda m, p, rngs: m.apply(
            {"params": p}, x, deterministic=False, rngs=rngs
        )
    else:
        cfg = BertConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, lora_rank=2,
        )
        make = lambda r: BertTextEncoder(
            dataclasses.replace(cfg, remat=r, remat_policy=policy),
            output_dim=16,
        )
        ids = jnp.asarray(
            np.random.default_rng(1).integers(0, 64, size=(2, 10)), jnp.int32
        )
        apply = lambda m, p, rngs: m.apply(
            {"params": p}, ids, deterministic=False, rngs=rngs
        )

    m0, m1 = make(False), make(True)
    k = jax.random.PRNGKey(0)
    p0 = m0.init({"params": k, "dropout": k}, *_init_args(tower))
    p1 = m1.init({"params": k, "dropout": k}, *_init_args(tower))
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    assert tree_max_diff(p0, p1) == 0.0

    rngs = {"dropout": jax.random.PRNGKey(7)}
    o0 = apply(m0, p0["params"], rngs)
    o1 = apply(m1, p0["params"], rngs)
    assert tree_max_diff(o0, o1) == 0.0  # same dropout masks, bitwise

    g0 = jax.grad(lambda p: apply(m0, p, rngs).sum())(p0["params"])
    g1 = jax.grad(lambda p: apply(m1, p, rngs).sum())(p0["params"])
    # recompute reorders float ops; grads agree to roundoff, not bitwise
    for x, y in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)


def _init_args(tower):
    if tower == "vit":
        return (jnp.zeros((1, 32, 32, 3)),)
    return (jnp.zeros((1, 10), jnp.int32),)


def test_gelu_exact_bit_identical():
    """gelu_exact (the "dots_act"-taggable form) must match
    jax.nn.gelu(approximate=False) bitwise in fp32 and bf16."""
    from bioscan_clip_tpu.models.common import gelu_exact

    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal(4096) * 4, dtype
        )
        a = gelu_exact(x)
        b = jax.nn.gelu(x, approximate=False)
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_flagship_factory_flag():
    """tpu.remat=true threads into every tower config via load_clip_model."""
    from bioscan_clip_tpu.config.core import ConfigNode
    from bioscan_clip_tpu.models.clip import load_clip_model

    args = ConfigNode(
        {
            "model_config": {
                "output_dim": 768,
                "image": {"input_type": "image", "model": "lora_vit"},
                "dna": {"input_type": "sequence", "model": "lora_barcode_bert"},
                "language": {"input_type": "sequence", "model": "lora_bert"},
            },
            "tpu": {"remat": True},
        }
    )
    model = load_clip_model(args)
    assert model.image_encoder.cfg.remat is True
    assert model.dna_encoder.cfg.remat is True
    assert model.language_encoder.cfg.remat is True
