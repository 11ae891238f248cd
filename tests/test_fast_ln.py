"""BSCAN_FAST_LN: bf16 LayerNorm compute is an opt-in inference-throughput
knob (models/common.py). These tests pin (a) default-off exactness and
(b) a small bounded drift when on."""

import numpy as np
import jax
import jax.numpy as jnp

from bioscan_clip_tpu.models.vit import ViT, ViTConfig


def _embed(monkeypatch, fast: bool):
    monkeypatch.setenv("BSCAN_FAST_LN", "1" if fast else "0")
    model = ViT(
        ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=2,
                  num_heads=2, num_classes=16, lora_rank=2),
        dtype=jnp.bfloat16,
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x, deterministic=True)["params"]
    out = model.apply({"params": params}, x, deterministic=True)
    return np.asarray(out, np.float32)


def test_fast_ln_default_off_is_exact(monkeypatch):
    a = _embed(monkeypatch, fast=False)
    monkeypatch.delenv("BSCAN_FAST_LN", raising=False)
    b = _embed(monkeypatch, fast=False)
    np.testing.assert_array_equal(a, b)


def test_fast_ln_drift_bounded(monkeypatch):
    ref = _embed(monkeypatch, fast=False)
    fast = _embed(monkeypatch, fast=True)
    # normalized-embedding cosine: the retrieval-relevant metric
    rn = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    fn = fast / np.linalg.norm(fast, axis=-1, keepdims=True)
    cos = (rn * fn).sum(-1)
    assert cos.min() > 0.999, cos
