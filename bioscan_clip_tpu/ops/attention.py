"""Fused multi-head attention Pallas kernel for the short-sequence towers.

Why a kernel: XLA materializes the (B, h, N, N) score/probability matrices
in HBM between the QK^T matmul, the softmax, and the AV matmul — at the
flagship shapes (ViT-B: B=256, h=12, N=197) that is ~240 MB of bf16 traffic
per layer read/written multiple times, and the 197-wide lane dimension pads
to 256 on every store. At these sequence lengths the *entire* attention for
one batch row fits in VMEM, so the kernel computes QK^T -> softmax -> AV
per (batch,) grid instance without the scores ever leaving the chip, with
fp32 softmax (an accuracy upgrade over the bf16-softmax XLA path it
replaces — see models/vit.py history).

Two entry points matching the two tower layouts (no host/device transposes):
- `mha_packed(qkv, heads=...)`  — ViT's fused-qkv Dense output (B, N, 3D)
  (reference timm attention: bioscanclip/model/image_encoder.py:42-48).
- `mha(q, k, v, heads=..., bias=...)` — BERT's separate q/k/v Dense outputs
  (B, N, D) each, with an optional additive key-padding bias (B, N)
  (HF BertSelfAttention semantics: dna_encoder.py / language_encoder.py).

Both are `jax.custom_vjp`: the forward is the Pallas kernel, the backward
recomputes the probabilities with plain XLA einsums (cheap at these N; no
stored (B, h, N, N) residuals, so training *saves* the probability tensor's
HBM round-trip in the forward).

Gating: `fused_attention_enabled()` — on for the TPU backend, overridable
with BSCAN_FUSED_ATTENTION=0/1. CPU tests exercise the kernel with
`interpret=True`.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    """True when ops traced *now* will run on a TPU. Respects an active
    `jax.default_device(cpu)` context (e.g. host-side model.init on a TPU
    host), where a compiled pallas_call would fail."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"


def fused_attention_enabled() -> bool:
    v = os.environ.get("BSCAN_FUSED_ATTENTION", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    return _on_tpu()


def _mix32(x):
    """uint32 avalanche mix (murmur3-finalizer family) — identical jnp ops
    inside the Pallas kernel and in the XLA backward, so the dropout mask
    recomputes bit-exactly."""
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _keep_threshold(rate: float) -> int:
    """uint32 threshold: u >= thresh keeps the element (P(keep) = 1-rate)."""
    return min(int(rate * 2.0**32), 2**32 - 1)


def dropout_keep_2d(seed, b_idx, head, n: int, rate: float, heads: int):
    """(N, N) keep/scale mask for attention-probability dropout of one
    (batch row, head): counter-based, seeded by (seed, b, h, i, j).

    Row-keyed mode (batch-composition-invariant dropout): the caller passes
    a PER-ROW seed and b_idx=0 — the counter then depends only on
    (row seed, h, i, j), so the row's mask is identical however the batch
    is grouped (GradCache stage-1 chunking, microbatching, sharding)."""
    i = jax.lax.broadcasted_iota(jnp.uint32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.uint32, (n, n), 1)
    b_u = jnp.asarray(b_idx).astype(jnp.uint32)
    idx = ((b_u * heads + head) * n + i) * n + j  # unique uint32 counter
    u = _mix32(jnp.asarray(seed).astype(jnp.uint32) ^ _mix32(idx))
    keep = u >= jnp.uint32(_keep_threshold(rate))
    return keep.astype(jnp.float32) / jnp.float32(1.0 - rate)


def dropout_keep_4d(seed, B: int, heads: int, n: int, rate: float):
    """(B, heads, N, N) mask — the same per-element formula as
    dropout_keep_2d, used by the XLA backward recompute (and by the
    non-fused XLA attention path in row-keyed mode).

    `seed` scalar: legacy keying (counter includes the batch index).
    `seed` (B,) vector: row-keyed — bit-equal to dropout_keep_2d with
    b_idx=0 and that row's seed, independent of batch grouping."""
    shape = (B, heads, n, n)
    h = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    i = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    j = jax.lax.broadcasted_iota(jnp.uint32, shape, 3)
    seed = jnp.asarray(seed).astype(jnp.uint32)
    if seed.ndim == 1:
        idx = (h * n + i) * n + j  # no batch term: row identity is the seed
        u = _mix32(seed[:, None, None, None] ^ _mix32(idx))
    else:
        b = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        idx = ((b * heads + h) * n + i) * n + j
        u = _mix32(seed ^ _mix32(idx))
    keep = u >= jnp.uint32(_keep_threshold(rate))
    return keep.astype(jnp.float32) / jnp.float32(1.0 - rate)


def _attend_one_row(q, k, v, bias_row, heads: int, scale: float, o_ref,
                    drop=None):
    """q/k/v: (N, D) VMEM values; bias_row: (1, N) fp32 or None.

    Writes (N, D) into o_ref[0]. Unrolled over heads: each head is a
    (N, hd) @ (hd, N) MXU matmul -> fp32 softmax in VMEM -> (N, N) @ (N, hd).

    `drop`: optional (rate, seed, batch_idx) — in-kernel attention
    probability dropout (VMEM mask, never touches HBM; HF Bert training
    semantics)."""
    n, d = q.shape
    hd = d // heads
    for i in range(heads):
        lo = i * hd
        qh = q[:, lo : lo + hd]
        kh = k[:, lo : lo + hd]
        vh = v[:, lo : lo + hd]
        s = jax.lax.dot_general(
            qh,
            kh,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if bias_row is not None:
            s = s + bias_row  # (1, N) broadcasts over query rows
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if drop is not None:
            rate, seed, b_idx = drop
            p = p * dropout_keep_2d(seed, b_idx, i, n, rate, heads)
        oh = jnp.dot(
            p.astype(v.dtype), vh, preferred_element_type=jnp.float32
        )
        o_ref[0, :, lo : lo + hd] = oh.astype(o_ref.dtype)


def _packed_kernel(heads, scale, qkv_ref, o_ref):
    d = o_ref.shape[-1]
    qkv = qkv_ref[0]
    _attend_one_row(
        qkv[:, :d], qkv[:, d : 2 * d], qkv[:, 2 * d :], None, heads, scale,
        o_ref,
    )


def _packed_mask_kernel(heads, scale, qkv_ref, m_ref, o_ref):
    d = o_ref.shape[-1]
    qkv = qkv_ref[0]
    _attend_one_row(
        qkv[:, :d], qkv[:, d : 2 * d], qkv[:, 2 * d :],
        m_ref[:].astype(jnp.float32), heads, scale, o_ref,
    )


def _split_kernel(heads, scale, q_ref, k_ref, v_ref, o_ref):
    _attend_one_row(q_ref[0], k_ref[0], v_ref[0], None, heads, scale, o_ref)


def _split_bias_kernel(heads, scale, q_ref, k_ref, v_ref, b_ref, o_ref):
    # b_ref block is (1, 1, N) — TPU requires the trailing two block dims be
    # full-size or (8, 128)-aligned, so the (B, N) bias ships as (B, 1, N).
    _attend_one_row(
        q_ref[0], k_ref[0], v_ref[0], b_ref[0].astype(jnp.float32), heads,
        scale, o_ref,
    )


def _row_drop(rate, row_keyed, seed_ref):
    """(rate, seed, b_idx) triple for _attend_one_row. Row-keyed mode: the
    whole (B,) seed vector sits in SMEM (Mosaic requires full-size rank-1
    SMEM blocks) and each grid instance picks ITS row's seed; the hash
    counter then drops the batch index (b_idx=0) so the mask depends only
    on (row seed, h, i, j) — batch-composition-invariant."""
    if row_keyed:
        return (rate, seed_ref[pl.program_id(0)], jnp.uint32(0))
    return (rate, seed_ref[0], pl.program_id(0))


def _split_drop_kernel(heads, scale, rate, row_keyed, seed_ref, q_ref,
                       k_ref, v_ref, o_ref):
    drop = _row_drop(rate, row_keyed, seed_ref)
    _attend_one_row(
        q_ref[0], k_ref[0], v_ref[0], None, heads, scale, o_ref, drop=drop
    )


def _split_bias_drop_kernel(heads, scale, rate, row_keyed, seed_ref, q_ref,
                            k_ref, v_ref, b_ref, o_ref):
    drop = _row_drop(rate, row_keyed, seed_ref)
    _attend_one_row(
        q_ref[0], k_ref[0], v_ref[0], b_ref[0].astype(jnp.float32), heads,
        scale, o_ref, drop=drop,
    )


def _attend_bwd_one_row(q, k, v, g, bias_row, mask2d, heads: int,
                        scale: float, dq_ref, dk_ref, dv_ref, drop=None,
                        db_acc=None):
    """Backward of `_attend_one_row` for one batch instance, entirely in
    VMEM: recomputes the fp32 softmax per head (flash-style — the (h, N, N)
    probabilities never touch HBM in either direction) and emits
    dq/dk/dv (N, D). Math mirrors `_mha_bwd_math` exactly, including the
    bit-exact counter-hash dropout mask recompute.

    Returns the (1, N) fp32 dbias accumulator (sum of ds over heads and
    query rows) when `db_acc` is not None."""
    n, d = q.shape
    hd = d // heads
    for i in range(heads):
        lo = i * hd
        qh = q[:, lo : lo + hd]
        kh = k[:, lo : lo + hd]
        vh = v[:, lo : lo + hd]
        gh = g[:, lo : lo + hd]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if bias_row is not None:
            s = s + bias_row
        if mask2d is not None:
            s = s + mask2d
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # (N, N) fp32
        keep = None
        if drop is not None:
            rate, seed, b_idx = drop
            keep = dropout_keep_2d(seed, b_idx, i, n, rate, heads)
        y = p if keep is None else p * keep
        # dv_h = y^T @ g_h
        dvh = jax.lax.dot_general(
            y.astype(gh.dtype), gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dp = g_h @ v_h^T  (dL/dy)
        dp = jax.lax.dot_general(
            gh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if keep is not None:
            dp = dp * keep
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsc = (ds * scale).astype(q.dtype)
        dqh = jnp.dot(dsc, kh, preferred_element_type=jnp.float32)
        dkh = jax.lax.dot_general(
            dsc, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, :, lo : lo + hd] = dqh.astype(dq_ref.dtype)
        dk_ref[0, :, lo : lo + hd] = dkh.astype(dk_ref.dtype)
        dv_ref[0, :, lo : lo + hd] = dvh.astype(dv_ref.dtype)
        if db_acc is not None:
            db_acc = db_acc + jnp.sum(ds, axis=0, keepdims=True)
    return db_acc


def _bwd_kernel(heads, scale, rate, row_keyed, has_bias, has_mask, packed,
                *refs):
    """Shared Pallas backward kernel body; ref order:
    [seed?] q|qkv, k?, v?, [bias?|mask?], g, then outputs
    dq|dqkv, dk?, dv?, [dbias?]."""
    refs = list(refs)
    seed = None
    if rate > 0:
        seed_ref = refs.pop(0)
        seed = (
            seed_ref[pl.program_id(0)] if row_keyed else seed_ref[0]
        )
    if packed:
        qkv = refs.pop(0)[0]
        d = qkv.shape[-1] // 3
        q, k, v = qkv[:, :d], qkv[:, d : 2 * d], qkv[:, 2 * d :]
    else:
        q = refs.pop(0)[0]
        k = refs.pop(0)[0]
        v = refs.pop(0)[0]
    bias_row = refs.pop(0)[0].astype(jnp.float32) if has_bias else None
    mask2d = refs.pop(0)[:].astype(jnp.float32) if has_mask else None
    g = refs.pop(0)[0]
    if packed:
        dqkv_ref = refs.pop(0)
        d = g.shape[-1]
        dq_ref = dqkv_ref.at[:, :, :d]
        dk_ref = dqkv_ref.at[:, :, d : 2 * d]
        dv_ref = dqkv_ref.at[:, :, 2 * d :]
    else:
        dq_ref = refs.pop(0)
        dk_ref = refs.pop(0)
        dv_ref = refs.pop(0)
    db_ref = refs.pop(0) if has_bias else None
    drop = None
    if rate > 0:
        drop = (rate, seed, jnp.uint32(0) if row_keyed else pl.program_id(0))
    db = _attend_bwd_one_row(
        q, k, v, g, bias_row, mask2d, heads, scale,
        dq_ref, dk_ref, dv_ref, drop=drop,
        db_acc=(jnp.zeros((1, g.shape[0]), jnp.float32)
                if has_bias else None),
    )
    if db_ref is not None:
        db_ref[0] = db.astype(db_ref.dtype)


def _pallas_mha_bwd(q, k, v, g, bias, mask, heads, scale, interpret,
                    rate: float = 0.0, seed=None, packed_qkv=None):
    """Pallas backward dispatch. Either (q, k, v) or `packed_qkv` is set.
    Returns (dq, dk, dv, dbias), or the (B, N, 3D) dqkv when packed."""
    packed = packed_qkv is not None
    if packed:
        b, n, d3 = packed_qkv.shape
        d = d3 // 3
    else:
        b, n, d = q.shape
    specs, args = [], []
    row_keyed = False
    if rate > 0:
        seed_arr = jnp.asarray(seed, jnp.uint32)
        row_keyed = seed_arr.ndim == 1
        if row_keyed:
            specs.append(
                pl.BlockSpec(
                    (seed_arr.shape[0],), lambda b: (0,),
                    memory_space=pltpu.SMEM,
                )
            )
            args.append(seed_arr)
        else:
            specs.append(
                pl.BlockSpec((1,), lambda b: (0,), memory_space=pltpu.SMEM)
            )
            args.append(seed_arr.reshape(1))
    if packed:
        specs.append(_row_spec(n, d3))
        args.append(packed_qkv)
    else:
        specs += [_row_spec(n, d)] * 3
        args += [q, k, v]
    has_bias = bias is not None
    has_mask = mask is not None
    if has_bias:
        specs.append(
            pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(bias[:, None, :])
    if has_mask:
        specs.append(
            pl.BlockSpec((n, n), lambda b: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(mask)
    specs.append(_row_spec(n, d))
    args.append(g)
    ref_dtype = packed_qkv.dtype if packed else q.dtype
    if packed:
        out_specs = [_row_spec(n, d3)]
        out_shapes = [jax.ShapeDtypeStruct((b, n, d3), ref_dtype)]
    else:
        out_specs = [_row_spec(n, d)] * 3
        out_shapes = [jax.ShapeDtypeStruct((b, n, d), ref_dtype)] * 3
    if has_bias:
        out_specs.append(
            pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((b, 1, n), jnp.float32))
    kern = functools.partial(
        _bwd_kernel, heads, scale, rate, row_keyed, has_bias, has_mask,
        packed,
    )
    outs = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    if packed:
        return outs[0]  # (B, N, 3D) dqkv, already in fused layout
    dq, dk, dv = outs[:3]
    dbias = None
    if has_bias:
        dbias = outs[-1][:, 0, :].astype(bias.dtype)
    return dq, dk, dv, dbias


def pallas_bwd_enabled() -> bool:
    """Opt-in (`BSCAN_PALLAS_MHA_BWD=1`): replace the XLA-math backward
    with an in-kernel flash-style backward (fp32 probabilities recomputed
    per (batch, head) in VMEM, never materialized in HBM).

    Default OFF: measured on a v5e at flagship shapes
    (tools/smoke_mha_bwd_tpu.py, B=32 N=197), the Pallas backward runs
    ~13x SLOWER than the XLA math it replaces (34.2 ms vs 2.5 ms) — the
    batch-grid x unrolled-head structure that wins the forward (2 matmuls
    per head, HBM-probability traffic avoided) loses backward, where each
    head needs 6 small matmuls, half in transposed orientation, and the
    avoided HBM traffic is small next to the extra MXU underutilization.
    Kept as a tested, numerically-exact alternative for backends where
    probability HBM traffic dominates (long N)."""
    return os.environ.get("BSCAN_PALLAS_MHA_BWD", "0") == "1"


def _row_spec(n, d):
    return pl.BlockSpec((1, n, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)


def _pallas_mha_packed(qkv, mask, heads, scale, interpret):
    b, n, d3 = qkv.shape
    d = d3 // 3
    specs = [_row_spec(n, d3)]
    args = [qkv]
    if mask is None:
        kern = functools.partial(_packed_kernel, heads, scale)
    else:
        # (N, N) additive score mask shared across the batch (causal text)
        kern = functools.partial(_packed_mask_kernel, heads, scale)
        specs.append(
            pl.BlockSpec((n, n), lambda b: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(mask)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=specs,
        out_specs=_row_spec(n, d),
        out_shape=jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
        interpret=interpret,
    )(*args)


def _pallas_mha_split(q, k, v, bias, heads, scale, interpret,
                      rate: float = 0.0, seed=None):
    b, n, d = q.shape
    specs = []
    args = []
    if rate > 0:
        # dropout seed in SMEM: scalar (shared, legacy keying) or (B,)
        # per-row seeds (row-keyed: each grid instance gets its own row's
        # seed via the block index map -> batch-composition-invariant mask)
        seed_arr = jnp.asarray(seed, jnp.uint32)
        row_keyed = seed_arr.ndim == 1
        if row_keyed:
            # full (B,) vector in SMEM for every grid instance: Mosaic
            # requires rank-1 SMEM blocks be full-size; the kernel indexes
            # its row by pl.program_id (see _row_drop)
            specs.append(
                pl.BlockSpec(
                    (seed_arr.shape[0],), lambda b: (0,),
                    memory_space=pltpu.SMEM,
                )
            )
            args.append(seed_arr)
        else:
            specs.append(
                pl.BlockSpec((1,), lambda b: (0,), memory_space=pltpu.SMEM)
            )
            args.append(seed_arr.reshape(1))
        kern = (
            functools.partial(
                _split_drop_kernel, heads, scale, rate, row_keyed
            )
            if bias is None
            else functools.partial(
                _split_bias_drop_kernel, heads, scale, rate, row_keyed
            )
        )
    else:
        kern = (
            functools.partial(_split_kernel, heads, scale)
            if bias is None
            else functools.partial(_split_bias_kernel, heads, scale)
        )
    specs += [_row_spec(n, d)] * 3
    args += [q, k, v]
    if bias is not None:
        specs.append(
            pl.BlockSpec(
                (1, 1, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
        )
        args.append(bias[:, None, :])
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=specs,
        out_specs=_row_spec(n, d),
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        interpret=interpret,
    )(*args)


def _xla_probs(q, k, bias, heads, scale, mask=None):
    """Reference probabilities in fp32, (B, h, N, N) — backward recompute.

    bias: optional (B, N) key-padding bias. mask: optional (N, N) additive
    score mask shared across the batch (causal text attention)."""
    b, n, d = q.shape
    hd = d // heads
    qh = q.reshape(b, n, heads, hd)
    kh = k.reshape(b, n, heads, hd)
    s = jnp.einsum(
        "bnhd,bmhd->bhnm", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        s = s + bias[:, None, None, :].astype(jnp.float32)
    if mask is not None:
        s = s + mask[None, None, :, :].astype(jnp.float32)
    return jax.nn.softmax(s, axis=-1)


def xla_mha(q, k, v, bias, heads, scale, mask=None):
    """Pure-XLA fused-semantics reference (fp32 softmax). Used by tests and
    as the non-TPU fallback with identical numerics contract."""
    b, n, d = q.shape
    hd = d // heads
    p = _xla_probs(q, k, bias, heads, scale, mask)
    vh = v.reshape(b, n, heads, hd)
    o = jnp.einsum(
        "bhnm,bmhd->bnhd", p.astype(v.dtype), vh,
        preferred_element_type=jnp.float32,
    )
    return o.reshape(b, n, d).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _mha_op(heads, scale, interpret, q, k, v, bias):
    return _pallas_mha_split(q, k, v, bias, heads, scale, interpret)


def _mha_op_fwd(heads, scale, interpret, q, k, v, bias):
    out = _pallas_mha_split(q, k, v, bias, heads, scale, interpret)
    return out, (q, k, v, bias)


def _attn_bwd_store_dtype(q):
    """Storage dtype for the backward's (B, h, N, N) intermediates: the
    attention compute dtype. In bf16 towers this halves the backward's
    dominant HBM traffic (softmax internals and matmul accumulation stay
    fp32 — only the materialized HBM stores quantize, matching the
    non-fused XLA path's scores-in-compute-dtype contract); for fp32
    inputs every cast is a no-op, so the fp32 oracle/tests are bit-exact.
    `BSCAN_ATTN_BWD_FP32=1` forces fp32 stores in bf16 towers too."""
    if os.environ.get("BSCAN_ATTN_BWD_FP32", "0") == "1":
        return jnp.float32
    return q.dtype


def _mha_bwd_math(heads, scale, res, g, mask=None, rate: float = 0.0,
                  seed=None):
    q, k, v, bias = res
    b, n, d = q.shape
    hd = d // heads
    sdt = _attn_bwd_store_dtype(q)
    # (B, h, N, N), fp32 softmax internally, stored in sdt
    p = _xla_probs(q, k, bias, heads, scale, mask).astype(sdt)
    keep = None
    if rate > 0:
        # bit-exact recompute of the kernel's in-VMEM dropout mask
        keep = dropout_keep_4d(seed, b, heads, n, rate)
    y = p if keep is None else (p * keep).astype(sdt)  # dropped probs
    gh = g.reshape(b, n, heads, hd)
    vh = v.reshape(b, n, heads, hd)
    qh = q.reshape(b, n, heads, hd)
    kh = k.reshape(b, n, heads, hd)
    dv = jnp.einsum("bhnm,bnhd->bmhd", y.astype(g.dtype), gh)
    dp = jnp.einsum(
        "bnhd,bmhd->bhnm", gh, vh, preferred_element_type=jnp.float32
    ).astype(sdt)  # dL/dy
    if keep is not None:
        dp = (dp * keep).astype(sdt)  # chain through the dropout scaling
    # softmax backward: row correction accumulated in fp32
    row = jnp.sum((dp * p).astype(jnp.float32), axis=-1, keepdims=True)
    ds = p.astype(jnp.float32) * (dp.astype(jnp.float32) - row)
    dsc = (ds * scale).astype(g.dtype)
    dq = jnp.einsum("bhnm,bmhd->bnhd", dsc, kh).reshape(b, n, d)
    dk = jnp.einsum("bhnm,bnhd->bmhd", dsc, qh).reshape(b, n, d)
    dbias = None
    if bias is not None:
        # never used in practice (bias derives from an integer mask); XLA
        # dead-code-eliminates this reduction when the cotangent is unused.
        dbias = jnp.sum(ds, axis=(1, 2)).astype(bias.dtype)
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.reshape(b, n, d).astype(v.dtype),
        dbias,
    )


def _mha_op_bwd(heads, scale, interpret, res, g):
    if pallas_bwd_enabled():
        q, k, v, bias = res
        return _pallas_mha_bwd(
            q, k, v, g, bias, None, heads, scale, interpret
        )
    return _mha_bwd_math(heads, scale, res, g)


_mha_op.defvjp(_mha_op_fwd, _mha_op_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _mha_drop_op(heads, scale, interpret, rate, q, k, v, bias, seed):
    return _pallas_mha_split(
        q, k, v, bias, heads, scale, interpret, rate=rate, seed=seed
    )


def _mha_drop_op_fwd(heads, scale, interpret, rate, q, k, v, bias, seed):
    out = _pallas_mha_split(
        q, k, v, bias, heads, scale, interpret, rate=rate, seed=seed
    )
    return out, (q, k, v, bias, seed)


def _mha_drop_op_bwd(heads, scale, interpret, rate, res, g):
    q, k, v, bias, seed = res
    if pallas_bwd_enabled():
        dq, dk, dv, dbias = _pallas_mha_bwd(
            q, k, v, g, bias, None, heads, scale, interpret,
            rate=rate, seed=seed,
        )
    else:
        dq, dk, dv, dbias = _mha_bwd_math(
            heads, scale, (q, k, v, bias), g, rate=rate, seed=seed
        )
    return (dq, dk, dv, dbias, None)


_mha_drop_op.defvjp(_mha_drop_op_fwd, _mha_drop_op_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _mha_packed_op(heads, scale, interpret, qkv, mask):
    return _pallas_mha_packed(qkv, mask, heads, scale, interpret)


def _mha_packed_op_fwd(heads, scale, interpret, qkv, mask):
    return _pallas_mha_packed(qkv, mask, heads, scale, interpret), (qkv, mask)


def _mha_packed_op_bwd(heads, scale, interpret, res, g):
    qkv, mask = res
    if pallas_bwd_enabled():
        dqkv = _pallas_mha_bwd(
            None, None, None, g, None, mask, heads, scale, interpret,
            packed_qkv=qkv,
        )
        return (dqkv, None)
    d = qkv.shape[-1] // 3
    dq, dk, dv, _ = _mha_bwd_math(
        heads, scale,
        (qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :], None), g,
        mask=mask,
    )
    return (jnp.concatenate([dq, dk, dv], axis=-1), None)


_mha_packed_op.defvjp(_mha_packed_op_fwd, _mha_packed_op_bwd)


def mha(q, k, v, *, heads: int, bias=None, scale: float | None = None,
        interpret: bool | None = None, dropout_rate: float = 0.0,
        dropout_seed=None):
    """Fused attention over separate (B, N, D) q/k/v; optional (B, N) additive
    key bias (0 / -1e9 padding mask). Returns (B, N, D) in q.dtype.

    `dropout_rate > 0` + `dropout_seed` (uint32 scalar, e.g.
    `jax.random.bits(rng)`): attention-probability dropout computed INSIDE
    the kernel with a counter-based hash RNG — the same mask recomputes
    bit-exactly in the XLA backward, so training keeps the kernel's
    zero-HBM-probability-traffic win (HF Bert attention_dropout semantics).

    `dropout_seed` may instead be a (B,) uint32 vector of PER-ROW seeds:
    each row's mask then depends only on its own seed (row-keyed mode), so
    the mask is invariant to how rows are grouped into batches — the
    contract GradCache stage-1 chunking relies on (train/loop.py).

    interpret=None auto-selects the Pallas interpreter off-TPU (CPU tests
    with BSCAN_FUSED_ATTENTION=1 run the kernel interpreted)."""
    if scale is None:
        scale = (q.shape[-1] // heads) ** -0.5
    if interpret is None:
        interpret = not _on_tpu()
    if dropout_rate > 0:
        if dropout_seed is None:
            raise ValueError("dropout_rate > 0 requires dropout_seed")
        return _mha_drop_op(
            heads, float(scale), interpret, float(dropout_rate),
            q, k, v, bias, dropout_seed,
        )
    return _mha_op(heads, float(scale), interpret, q, k, v, bias)


def mha_packed(qkv, *, heads: int, scale: float | None = None,
               mask=None, interpret: bool | None = None):
    """Fused attention over a packed (B, N, 3D) qkv (q|k|v along the last
    axis, heads-major within each third — the timm/torch fused-qkv layout).
    `mask`: optional (N, N) additive score mask shared across the batch
    (OpenCLIP's causal text mask)."""
    if scale is None:
        scale = (qkv.shape[-1] // 3 // heads) ** -0.5
    if interpret is None:
        interpret = not _on_tpu()
    return _mha_packed_op(heads, float(scale), interpret, qkv, mask)
