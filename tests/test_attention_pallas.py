"""Fused MHA Pallas kernel (ops/attention.py): exactness vs the XLA path.

Runs on CPU in interpret mode (conftest pins JAX_PLATFORMS=cpu); the same
kernel code compiles via Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bioscan_clip_tpu.ops.attention import (
    mha,
    mha_packed,
    xla_mha,
)

NEG_INF = -1e9


def _rand(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


@pytest.mark.parametrize("n,heads,hd", [(197, 12, 64), (20, 8, 64), (133, 12, 64)])
def test_split_matches_xla_fp32(n, heads, hd):
    rng = np.random.default_rng(0)
    b, d = 3, heads * hd
    q, k, v = (_rand(rng, (b, n, d)) for _ in range(3))
    out = mha(q, k, v, heads=heads, interpret=True)
    ref = xla_mha(q, k, v, None, heads, hd**-0.5)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_split_with_key_padding_bias():
    rng = np.random.default_rng(1)
    b, n, heads, hd = 3, 20, 8, 64
    d = heads * hd
    q, k, v = (_rand(rng, (b, n, d)) for _ in range(3))
    lengths = np.array([20, 7, 13])
    mask = (np.arange(n)[None, :] < lengths[:, None]).astype(np.float32)
    bias = jnp.asarray(np.where(mask > 0, 0.0, NEG_INF), jnp.float32)
    out = mha(q, k, v, heads=heads, bias=bias, interpret=True)
    ref = xla_mha(q, k, v, bias, heads, hd**-0.5)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
    # padded keys must get zero probability: perturbing them is a no-op
    k_pert = k.at[1, 7:, :].add(3.0)
    out2 = mha(q, k_pert, v, heads=heads, bias=bias, interpret=True)
    np.testing.assert_allclose(out2[1], out[1], atol=1e-5, rtol=1e-5)


def test_packed_matches_split():
    rng = np.random.default_rng(2)
    b, n, heads, hd = 2, 197, 12, 64
    d = heads * hd
    q, k, v = (_rand(rng, (b, n, d)) for _ in range(3))
    qkv = jnp.concatenate([q, k, v], axis=-1)
    out_p = mha_packed(qkv, heads=heads, interpret=True)
    out_s = mha(q, k, v, heads=heads, interpret=True)
    np.testing.assert_allclose(out_p, out_s, atol=1e-6, rtol=1e-6)


def test_bf16_inputs_close_to_fp32_reference():
    rng = np.random.default_rng(3)
    b, n, heads, hd = 2, 133, 12, 64
    d = heads * hd
    q, k, v = (_rand(rng, (b, n, d)) for _ in range(3))
    out = mha(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), heads=heads, interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    ref = xla_mha(q, k, v, None, heads, hd**-0.5)
    np.testing.assert_allclose(
        out.astype(jnp.float32), ref, atol=3e-2, rtol=3e-2
    )


def test_custom_vjp_matches_xla_grads():
    rng = np.random.default_rng(4)
    b, n, heads, hd = 2, 29, 4, 16
    d = heads * hd
    q, k, v = (_rand(rng, (b, n, d)) for _ in range(3))
    g = _rand(rng, (b, n, d))

    def loss_fused(q, k, v):
        return jnp.sum(mha(q, k, v, heads=heads, interpret=True) * g)

    def loss_ref(q, k, v):
        return jnp.sum(xla_mha(q, k, v, None, heads, hd**-0.5) * g)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(a, b_, atol=1e-4, rtol=1e-4)


def test_packed_vjp_matches_xla_grads():
    rng = np.random.default_rng(5)
    b, n, heads, hd = 2, 17, 4, 16
    d = heads * hd
    qkv = _rand(rng, (b, n, 3 * d))
    g = _rand(rng, (b, n, d))

    def loss_fused(qkv):
        return jnp.sum(mha_packed(qkv, heads=heads, interpret=True) * g)

    def loss_ref(qkv):
        return jnp.sum(
            xla_mha(
                qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :],
                None, heads, hd**-0.5,
            ) * g
        )

    gf = jax.grad(loss_fused)(qkv)
    gr = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(gf, gr, atol=1e-4, rtol=1e-4)


def test_bias_grads_flow_through_mask_path():
    # bias participates in the vjp signature; grads w.r.t. q/k/v must be
    # correct when a bias is present (the bias cotangent itself is unused
    # in the towers — it derives from an integer attention_mask).
    rng = np.random.default_rng(6)
    b, n, heads, hd = 2, 13, 2, 8
    d = heads * hd
    q, k, v = (_rand(rng, (b, n, d)) for _ in range(3))
    bias = jnp.asarray(
        np.where(np.arange(n)[None, :] < 9, 0.0, NEG_INF), jnp.float32
    ) * jnp.ones((b, 1))
    g = _rand(rng, (b, n, d))

    def loss_fused(q, k, v):
        return jnp.sum(mha(q, k, v, heads=heads, bias=bias, interpret=True) * g)

    def loss_ref(q, k, v):
        return jnp.sum(xla_mha(q, k, v, bias, heads, hd**-0.5) * g)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(a, b_, atol=1e-4, rtol=1e-4)


def test_packed_causal_mask_matches_xla():
    rng = np.random.default_rng(7)
    b, n, heads, hd = 2, 77, 8, 64
    d = heads * hd
    qkv = _rand(rng, (b, n, 3 * d))
    causal = jnp.triu(jnp.full((n, n), NEG_INF, jnp.float32), k=1)
    out = mha_packed(qkv, heads=heads, mask=causal, interpret=True)
    ref = xla_mha(
        qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :],
        None, heads, hd**-0.5, mask=causal,
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
    # causality: perturbing future tokens leaves earlier outputs unchanged
    qkv2 = qkv.at[:, n // 2 :, :].add(1.0)
    out2 = mha_packed(qkv2, heads=heads, mask=causal, interpret=True)
    # keys/values of future positions masked for queries < n//2 — but note
    # q of those positions unchanged, so rows [:n//2] must match
    np.testing.assert_allclose(
        out2[:, : n // 2], out[:, : n // 2], atol=1e-5, rtol=1e-5
    )


def test_vit_block_fused_matches_xla_path(monkeypatch):
    """Module-level: the whole ViT forward with the fused kernel (interpreted
    on CPU) matches the XLA einsum path."""
    from bioscan_clip_tpu.models.vit import ViT, ViTConfig

    cfg = ViTConfig(
        image_size=32, patch_size=16, hidden_size=64, num_layers=2,
        num_heads=4, num_classes=16, lora_rank=2,
    )
    model = ViT(cfg)
    rng = np.random.default_rng(8)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)

    monkeypatch.setenv("BSCAN_FUSED_ATTENTION", "0")
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    ref = model.apply({"params": params}, img)
    monkeypatch.setenv("BSCAN_FUSED_ATTENTION", "1")
    out = model.apply({"params": params}, img)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_bert_encoder_fused_matches_xla_path(monkeypatch):
    from bioscan_clip_tpu.models.bert import BertConfig, BertEncoder

    cfg = BertConfig(
        vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, lora_rank=2,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    model = BertEncoder(cfg)
    rng = np.random.default_rng(9)
    ids = jnp.asarray(rng.integers(0, 100, size=(2, 12)), jnp.int32)
    mask = jnp.asarray([[1] * 12, [1] * 7 + [0] * 5], jnp.int32)

    monkeypatch.setenv("BSCAN_FUSED_ATTENTION", "0")
    params = model.init(jax.random.PRNGKey(0), ids, attention_mask=mask)[
        "params"
    ]
    ref = model.apply({"params": params}, ids, attention_mask=mask)
    monkeypatch.setenv("BSCAN_FUSED_ATTENTION", "1")
    out = model.apply({"params": params}, ids, attention_mask=mask)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_openclip_text_fused_matches_xla_path(monkeypatch):
    from bioscan_clip_tpu.models.openclip import (
        OpenClipTextConfig,
        OpenClipTextTower,
    )

    cfg = OpenClipTextConfig(
        width=32, heads=4, layers=2, vocab_size=100, context_length=16,
        output_dim=16, lora_rank=2,
    )
    model = OpenClipTextTower(cfg)
    rng = np.random.default_rng(10)
    ids = jnp.asarray(rng.integers(1, 99, size=(2, 16)), jnp.int32)

    monkeypatch.setenv("BSCAN_FUSED_ATTENTION", "0")
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    ref = model.apply({"params": params}, ids)
    monkeypatch.setenv("BSCAN_FUSED_ATTENTION", "1")
    out = model.apply({"params": params}, ids)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)
