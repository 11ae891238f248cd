"""Shared tower knobs.

`ln_dtype()` — LayerNorm compute dtype for the towers. Default fp32: exact
checkpoint-parity numerics and training stability (SURVEY.md §7 hard part
1). `BSCAN_FAST_LN=1` opts inference into bf16 LN compute: the LNs are
HBM-bandwidth-bound elementwise passes over the full (B, N, D) residual
stream, so halving their traffic buys extraction throughput at a small,
measured embedding drift (tests/test_fast_ln.py bounds it; retrieval
near-ties can flip, so the parity eval path must leave this OFF).
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp
from jax import lax
from jax.ad_checkpoint import checkpoint_name


def ln_dtype():
    return (
        jnp.bfloat16
        if os.environ.get("BSCAN_FAST_LN", "0") == "1"
        else jnp.float32
    )


def gelu_exact(x):
    """Exact-erf GELU, bit-identical to `jax.nn.gelu(x, approximate=False)`
    (same `0.5 * x * erfc(-x*sqrt(0.5))` formula and dtype handling), with the
    erfc intermediate tagged `gelu_erf` so a remat save-policy can keep it.

    Why: under per-layer remat the backward needs erfc(-x*sqrt(0.5)) for
    gelu'(x) — the most expensive transcendental in the towers' backward
    recompute (~0.8 G evals/step at B=64 across 28 MLPs). Saving the tagged
    tensor ("dots_act" policy) trades ~19 MB/layer (bf16, B=64) for skipping
    every backward erfc; the exp(-x^2/2) term is recomputed (cheap)."""
    sqrt_half = np.sqrt(0.5).astype(jnp.dtype(x.dtype))
    e = checkpoint_name(lax.erfc(-x * sqrt_half), "gelu_erf")
    return jnp.array(0.5 * x * e, dtype=x.dtype)


def remat_policy(name: str):
    """Per-layer remat save-policy for the towers (ViTConfig/BertConfig
    `remat_policy`). Gradations between "recompute the whole block"
    (cheapest memory, ~+1 forward of extra MXU work per step) and
    "save everything" (round-2 measurement: OOMs the 16 GB chip by ~6.5 G
    at B=128 with K-step scan):

    - "full":   save only the inter-layer residual stream; recompute the
                entire block in the backward (jax.checkpoint default).
    - "dots":   save every weight-matmul output (qkv/proj/fc1/fc2 — the
                `dots_with_no_batch_dims_saveable` policy) plus the tagged
                fused-attention context; the backward recomputes only
                VPU-bound elementwise work (LN/GELU/softmax). Attention is
                ~N/(6*hidden) of block FLOPs (≈4% at N=197), so this
                removes nearly all of remat's recompute cost for
                ~+350 MB/layer at B=128 (ViT-B).
    - "narrow": save only the tagged attention context and pre-GELU MLP
                activation (`save_only_these_names`); the backward
                re-runs the qkv/proj matmuls but not fc1, and GELU/LN get
                their saved inputs. ~+195 MB/layer at B=128 (ViT-B) —
                the middle tier if "dots" doesn't fit.
    - "wide":   "dots" plus the tagged LayerNorm outputs — the backward
                recomputes nothing but GELU/softmax. LN backward fusions
                measured ~65 ms/step of the flagship's 340 ms at B=128
                (PERF_NOTES round 3); costs ~+39 MB per LN at B=128
                (ViT-B), affordable once same_batch frees the stacked
                input's HBM.
    - "dots_act": "dots" plus the tagged GELU erfc intermediates
                (`gelu_erf`, see gelu_exact) — the backward skips the
                towers' erfc recompute entirely for ~+19 MB/layer at B=64
                (bf16). The cheapest VPU-work reduction on top of "dots".
    """
    import jax

    if name in (None, "", "full"):
        return None
    if name == "dots":
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names("attn_ctx"),
        )
    if name == "dots_act":
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names(
                "attn_ctx", "gelu_erf"
            ),
        )
    if name == "narrow":
        return jax.checkpoint_policies.save_only_these_names(
            "attn_ctx", "mlp_pre"
        )
    if name == "wide":
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names(
                "attn_ctx", "ln_out"
            ),
        )
    raise ValueError(
        f"unknown remat_policy {name!r}: expected full | dots | narrow "
        "| wide | dots_act"
    )


# --- batch-composition-invariant ("per-sample") dropout -------------------
#
# Standard flax nn.Dropout draws one mask for the whole batch from a
# batch-shaped rng stream, so a row's mask changes whenever the batch is
# grouped differently. The helpers below key every mask element by
# (per-row seed, site, position within the row) through the same uint32
# counter hash the fused attention kernel uses (ops/attention.py _mix32) —
# a row's dropout is then IDENTICAL however rows are microbatched, chunked,
# or sharded. GradCache stage 1 exploits this to embed the full batch in
# large chunks while stage 3 recomputes per-microbatch with bit-equal
# masks (train/loop.py make_gradcache_train_step); it also makes gradient
# accumulation and multi-host sharding mask-invariant by construction.

_SALT_GOLD = 0x9E3779B9  # golden-ratio increment (splitmix-style chains)


def row_seeds_init(base_seed, row_ids):
    """(B,) uint32 per-row seed vector from a step-level uint32 seed and
    GLOBAL row ids (position in the full logical batch)."""
    from bioscan_clip_tpu.ops.attention import _mix32
    import jax.numpy as jnp

    base = jnp.asarray(base_seed).astype(jnp.uint32)
    rows = jnp.asarray(row_ids).astype(jnp.uint32)
    return _mix32(base ^ _mix32(rows + jnp.uint32(1)))


def row_salt_advance(row_salt):
    """Next layer's (B,) salt vector — a splitmix-style chain, so layer k's
    streams depend only on (row seed, k), never on batch grouping."""
    import jax.numpy as jnp

    from bioscan_clip_tpu.ops.attention import _mix32

    return _mix32(row_salt + jnp.uint32(_SALT_GOLD))


def site_seed(row_salt, site: int):
    """(B,) uint32 seed for dropout site `site` of the current layer."""
    import jax.numpy as jnp

    from bioscan_clip_tpu.ops.attention import _mix32

    c = (site * 0x85EBCA6B + 0xC2B2AE35) & 0xFFFFFFFF
    return _mix32(row_salt ^ jnp.uint32(c))


def ps_dropout(x, rate: float, row_salt, site: int,
               deterministic: bool = False):
    """Dropout over (B, ...) x whose mask element (b, pos) depends only on
    (row_salt[b], site, pos) — batch-composition-invariant (see module
    comment). Matches nn.Dropout semantics (keep-scale by 1/(1-rate))."""
    if deterministic or rate <= 0 or row_salt is None:
        return x
    import jax
    import jax.numpy as jnp

    from bioscan_clip_tpu.ops.attention import _keep_threshold, _mix32

    B = x.shape[0]
    flat = int(np.prod(x.shape[1:]))
    pos = jax.lax.broadcasted_iota(jnp.uint32, (B, flat), 1)
    s = site_seed(row_salt, site)
    u = _mix32(s[:, None] ^ _mix32(pos + jnp.uint32(1)))
    keep = (u >= jnp.uint32(_keep_threshold(rate))).reshape(x.shape)
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))
