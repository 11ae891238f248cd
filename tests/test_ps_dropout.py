"""Batch-composition-invariant ("per-sample") dropout: a row's masks
depend only on (its seed, the dropout site, the position within the row) —
never on how rows are grouped into batches. This is the contract GradCache
s1_chunk relies on (train/loop.py) and what makes gradient accumulation /
sharding mask-invariant by construction (models/common.py ps_dropout)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bioscan_clip_tpu.models.bert import (
    BarcodeBertDnaEncoder,
    BertConfig,
    BertTextEncoder,
)
from bioscan_clip_tpu.models.common import ps_dropout, row_seeds_init
from bioscan_clip_tpu.ops.attention import dropout_keep_4d


def test_ps_dropout_mask_grouping_invariant_bitexact():
    seeds = row_seeds_init(jnp.uint32(1234), jnp.arange(8))
    x = jnp.ones((8, 5, 7))
    full = ps_dropout(x, 0.3, seeds, 2, False)
    grouped = jnp.concatenate(
        [
            ps_dropout(x[:3], 0.3, seeds[:3], 2, False),
            ps_dropout(x[3:], 0.3, seeds[3:], 2, False),
        ]
    )
    assert jnp.array_equal(full, grouped)
    # sites draw independent streams
    other = ps_dropout(x, 0.3, seeds, 3, False)
    assert not jnp.array_equal(full, other)
    # rate honored (keep fraction ~ 1-rate, scale 1/(1-rate))
    keep_frac = float((full > 0).mean())
    assert abs(keep_frac - 0.7) < 0.1
    np.testing.assert_allclose(
        float(full.max()), 1.0 / 0.7, rtol=1e-6
    )


def test_ps_dropout_deterministic_and_zero_rate_passthrough():
    seeds = row_seeds_init(jnp.uint32(5), jnp.arange(4))
    x = jnp.arange(24.0).reshape(4, 6)
    assert jnp.array_equal(ps_dropout(x, 0.3, seeds, 1, True), x)
    assert jnp.array_equal(ps_dropout(x, 0.0, seeds, 1, False), x)
    assert jnp.array_equal(ps_dropout(x, 0.3, None, 1, False), x)


def test_dropout_keep_4d_row_keyed_matches_singletons():
    seeds = row_seeds_init(jnp.uint32(99), jnp.arange(6))
    full = dropout_keep_4d(seeds, 6, 2, 9, 0.25)
    ones = jnp.concatenate(
        [dropout_keep_4d(seeds[i : i + 1], 1, 2, 9, 0.25) for i in range(6)]
    )
    assert jnp.array_equal(full, ones)


def _dna_tower_and_inputs(B=8, N=12):
    cfg = BertConfig(
        vocab_size=101, hidden_size=32, num_layers=3, num_heads=2,
        intermediate_size=64, lora_rank=2,
        hidden_dropout=0.3, attention_dropout=0.3,
    )
    enc = BarcodeBertDnaEncoder(cfg, output_dim=16)
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, N), 0, 101)
    params = enc.init(jax.random.PRNGKey(1), ids, deterministic=True)
    seeds = row_seeds_init(jnp.uint32(1234), jnp.arange(B))
    return enc, params, ids, seeds


def test_bert_tower_row_seeds_grouping_invariant():
    """Tower outputs with row_seeds are grouping-invariant up to XLA's
    batch-shape-dependent matmul tiling rounding (the masks themselves are
    bit-equal — see the mask-level tests above)."""
    enc, params, ids, seeds = _dna_tower_and_inputs()
    full = enc.apply(params, ids, deterministic=False, row_seeds=seeds)
    grp = jnp.concatenate(
        [
            enc.apply(
                params, ids[:4], deterministic=False, row_seeds=seeds[:4]
            ),
            enc.apply(
                params, ids[4:], deterministic=False, row_seeds=seeds[4:]
            ),
        ]
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(grp), atol=1e-6
    )
    # dropout is actually active and seed-sensitive
    det = enc.apply(params, ids, deterministic=True)
    assert float(jnp.abs(full - det).max()) > 1e-3
    alt_seeds = row_seeds_init(jnp.uint32(4321), jnp.arange(8))
    alt = enc.apply(params, ids, deterministic=False, row_seeds=alt_seeds)
    assert float(jnp.abs(full - alt).max()) > 1e-4
    # legacy flax-rng path still works (row_seeds=None)
    leg = enc.apply(
        params, ids, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(5)},
    )
    assert leg.shape == full.shape


def test_bert_tower_fused_kernel_path_matches_xla_path(monkeypatch):
    """The fused-attention (Pallas, interpret on CPU) path's in-kernel
    row-keyed mask is the SAME counter formula as the XLA fallback's —
    outputs must match across paths and stay grouping-invariant."""
    enc, params, ids, seeds = _dna_tower_and_inputs()
    xla_out = enc.apply(params, ids, deterministic=False, row_seeds=seeds)
    monkeypatch.setenv("BSCAN_FUSED_ATTENTION", "1")
    fused = enc.apply(params, ids, deterministic=False, row_seeds=seeds)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(xla_out), atol=1e-5
    )
    grp = jnp.concatenate(
        [
            enc.apply(
                params, ids[:4], deterministic=False, row_seeds=seeds[:4]
            ),
            enc.apply(
                params, ids[4:], deterministic=False, row_seeds=seeds[4:]
            ),
        ]
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(grp), atol=1e-6
    )

    # gradients flow through the row-keyed fused kernel (custom_vjp path)
    def loss(p):
        return enc.apply(
            p, ids, deterministic=False, row_seeds=seeds
        ).sum()

    g = jax.grad(loss)(params)
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g)
    )


def test_text_tower_row_seeds_with_attention_mask():
    cfg = BertConfig(
        vocab_size=101, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, lora_rank=2,
        hidden_dropout=0.25, attention_dropout=0.25,
    )
    te = BertTextEncoder(cfg, output_dim=16)
    B, N = 8, 12
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, N), 0, 101)
    mask = (
        jax.random.uniform(jax.random.PRNGKey(3), (B, N)) > 0.3
    ).astype(jnp.int32)
    params = te.init(
        jax.random.PRNGKey(2), ids, attention_mask=mask, deterministic=True
    )
    seeds = row_seeds_init(jnp.uint32(7), jnp.arange(B))
    full = te.apply(
        params, ids, attention_mask=mask, deterministic=False,
        row_seeds=seeds,
    )
    grp = jnp.concatenate(
        [
            te.apply(
                params, ids[:3], attention_mask=mask[:3],
                deterministic=False, row_seeds=seeds[:3],
            ),
            te.apply(
                params, ids[3:], attention_mask=mask[3:],
                deterministic=False, row_seeds=seeds[3:],
            ),
        ]
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(grp), atol=1e-6
    )
