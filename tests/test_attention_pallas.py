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


def test_pallas_bwd_matches_math_bwd(monkeypatch):
    """The in-kernel (flash-style) backward == the XLA-math backward for
    every variant: split, split+bias, split+bias+dropout. Toggled via the
    BSCAN_PALLAS_MHA_BWD escape hatch."""
    rng = np.random.default_rng(11)
    b, n, heads, hd = 2, 29, 4, 16
    d = heads * hd
    q, k, v = (_rand(rng, (b, n, d)) for _ in range(3))
    g = _rand(rng, (b, n, d))
    lengths = np.array([29, 13])
    bias = jnp.asarray(
        np.where(np.arange(n)[None, :] < lengths[:, None], 0.0, NEG_INF),
        jnp.float32,
    )

    def grads(**mha_kw):
        def loss(q, k, v):
            return jnp.sum(mha(q, k, v, heads=heads, interpret=True,
                               **mha_kw) * g)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    for kw in (
        {},
        {"bias": bias},
        {"bias": bias, "dropout_rate": 0.25,
         "dropout_seed": jnp.uint32(99)},
    ):
        monkeypatch.setenv("BSCAN_PALLAS_MHA_BWD", "1")
        g_pallas = grads(**kw)
        monkeypatch.setenv("BSCAN_PALLAS_MHA_BWD", "0")
        g_math = grads(**kw)
        for a, b_ in zip(g_pallas, g_math):
            np.testing.assert_allclose(a, b_, atol=1e-4, rtol=1e-4)

    # packed (fused-qkv) variant, plain and with a causal score mask —
    # covers the dqkv ref-view writes and the mask ref ordering
    qkv = jnp.concatenate([q, k, v], axis=-1)
    causal = jnp.where(
        np.tril(np.ones((n, n), bool)), 0.0, NEG_INF
    ).astype(jnp.float32)

    def packed_grad(**kw):
        def loss(qkv):
            return jnp.sum(
                mha_packed(qkv, heads=heads, interpret=True, **kw) * g
            )

        return jax.grad(loss)(qkv)

    for kw in ({}, {"mask": causal}):
        monkeypatch.setenv("BSCAN_PALLAS_MHA_BWD", "1")
        gp = packed_grad(**kw)
        monkeypatch.setenv("BSCAN_PALLAS_MHA_BWD", "0")
        gm = packed_grad(**kw)
        np.testing.assert_allclose(gp, gm, atol=1e-4, rtol=1e-4)


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


def _xla_mha_with_mask(q, k, v, bias, heads, scale, keep):
    """Pure-XLA forward applying an explicit (B, h, N, N) keep mask to the
    softmax probabilities — oracle for the in-kernel dropout."""
    from bioscan_clip_tpu.ops.attention import _xla_probs

    b, n, d = q.shape
    hd = d // heads
    p = _xla_probs(q, k, bias, heads, scale) * keep
    vh = v.reshape(b, n, heads, hd)
    o = jnp.einsum("bhnm,bmhd->bnhd", p.astype(v.dtype), vh,
                   preferred_element_type=jnp.float32)
    return o.reshape(b, n, d).astype(q.dtype)


def test_inkernel_dropout_forward_matches_masked_xla():
    """The kernel's in-VMEM dropout == XLA forward with the explicitly
    materialized dropout_keep_4d mask (same hash RNG)."""
    from bioscan_clip_tpu.ops.attention import dropout_keep_4d

    rng = np.random.default_rng(1)
    b, n, heads, hd = 3, 36, 4, 16
    d = heads * hd
    q, k, v = (_rand(rng, (b, n, d)) for _ in range(3))
    seed = jnp.uint32(1234)
    rate = 0.25
    out = mha(q, k, v, heads=heads, interpret=True,
              dropout_rate=rate, dropout_seed=seed)
    keep = dropout_keep_4d(seed, b, heads, n, rate)
    ref = _xla_mha_with_mask(q, k, v, None, heads, hd**-0.5, keep)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5
    )
    # rate=0 path is byte-identical to the no-dropout op
    out0 = mha(q, k, v, heads=heads, interpret=True, dropout_rate=0.0)
    base = mha(q, k, v, heads=heads, interpret=True)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(base))


def test_inkernel_dropout_statistics_and_determinism():
    from bioscan_clip_tpu.ops.attention import dropout_keep_4d

    rate = 0.1
    keep = np.asarray(dropout_keep_4d(jnp.uint32(7), 4, 12, 64, rate))
    frac_kept = (keep > 0).mean()
    assert abs(frac_kept - (1 - rate)) < 0.01
    # kept elements carry the 1/(1-rate) scale
    vals = np.unique(keep)
    assert len(vals) == 2
    np.testing.assert_allclose(vals, [0.0, 1 / (1 - rate)], rtol=1e-6)
    # deterministic in the seed, different across seeds
    keep2 = np.asarray(dropout_keep_4d(jnp.uint32(7), 4, 12, 64, rate))
    np.testing.assert_array_equal(keep, keep2)
    keep3 = np.asarray(dropout_keep_4d(jnp.uint32(8), 4, 12, 64, rate))
    assert (keep != keep3).any()


def test_inkernel_dropout_grads_match_masked_xla():
    """custom_vjp backward (mask recomputed via the hash RNG) == jax.grad
    of the pure-XLA forward with the same explicit mask."""
    from bioscan_clip_tpu.ops.attention import dropout_keep_4d

    rng = np.random.default_rng(2)
    b, n, heads, hd = 2, 24, 4, 8
    d = heads * hd
    q, k, v = (_rand(rng, (b, n, d)) for _ in range(3))
    bias = jnp.where(jnp.arange(n)[None, :] < n - 4, 0.0, NEG_INF).astype(
        jnp.float32
    ) * jnp.ones((b, 1))
    seed = jnp.uint32(99)
    rate = 0.2
    scale = hd**-0.5
    keep = dropout_keep_4d(seed, b, heads, n, rate)

    def loss_kernel(q, k, v):
        o = mha(q, k, v, heads=heads, bias=bias, interpret=True,
                dropout_rate=rate, dropout_seed=seed)
        return jnp.sum(o * o)

    def loss_ref(q, k, v):
        o = _xla_mha_with_mask(q, k, v, bias, heads, scale, keep)
        return jnp.sum(o * o)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=5e-5, rtol=1e-4
        )


def test_bert_training_uses_fused_kernel_with_dropout(monkeypatch):
    """models/bert.py no longer falls back to XLA attention when training
    with attention_dropout > 0 (VERDICT r2 item 4): the fused path runs,
    dropout masks differ across layers/steps, and eval equals the
    dropout-free kernel output."""
    from bioscan_clip_tpu.models.bert import BertConfig, BertEncoder

    monkeypatch.setenv("BSCAN_FUSED_ATTENTION", "1")
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                     num_heads=2, intermediate_size=64, lora_rank=0,
                     hidden_dropout=0.0, attention_dropout=0.3)
    enc = BertEncoder(cfg, jnp.float32)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 12)))
    params = enc.init(jax.random.PRNGKey(0), ids, deterministic=True)

    out_eval = enc.apply(params, ids, deterministic=True)
    out_t1 = enc.apply(params, ids, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    out_t2 = enc.apply(params, ids, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(out_t1), np.asarray(out_eval))
    assert not np.allclose(np.asarray(out_t1), np.asarray(out_t2))
    # gradients flow through the training path
    g = jax.grad(
        lambda p: jnp.sum(
            enc.apply(p, ids, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(1)}) ** 2
        )
    )(params)
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g)
    )
