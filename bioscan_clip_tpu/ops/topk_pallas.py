"""Pallas TPU kernel: fused similarity + exact top-k retrieval.

The XLA path (retrieval/engine.py) materializes a (Bq, key_chunk) score
block in HBM per scan step and runs lax.top_k over (Bq, chunk + k). This
kernel fuses the MXU matmul with the top-k maintenance entirely in VMEM:

  grid = (num_key_tiles,)  -- sequential on TPU, so VMEM scratch carries the
  running (values, indices) top-k across tiles:
    S = Q @ K_tile.T                          (MXU, f32 accumulate)
    theta = row-min of the running top-k      (the k-th best so far)
    flag  = any(S > theta)                    (one VPU pass + scalar)
    while flag (<= k gated rounds):           (threshold-gated extraction)
        extract the per-row max of S, insert it into each row's running
        top-k where it beats that row's theta, mask the column, refresh
        the flag

The running top-k lives UNSORTED in a lane-aligned (Bq, ceil128(k))
buffer whose pad lanes are pinned at +inf, so one narrow row-min reads
theta. For random/real embeddings almost every tile after the first few
contains nothing above theta, so the merge costs ~2 full-width VPU
passes per tile instead of k full extraction sweeps — the sweeps
dominated the kernel once k exceeded ~5 (the int8 path oversamples to
k~21, which measured ~10x off matmul-bound before this gating). Worst
case (keys sorted ascending) degrades to the old k-pass cost.

Padding keys are masked by global index >= n_valid (scores -> -inf).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float("-inf")
POS = float("inf")
_I32_MAX = 2**31 - 1


def _run_lanes(k: int) -> int:
    """Lane width of the running-top-k scratch: k rounded up to 128."""
    return max(128, ((k + 127) // 128) * 128)


def _vmem_params(interpret: bool):
    """Raise Mosaic's 16 MB scoped-VMEM ceiling: tile-2048 / wide-q_block
    layouts (fewer grid steps, fewer key re-streams — BENCH_TOPK_r05
    measured 3x at int8 tile 2048 vs 512) exceed it while staying far
    under the physical 128 MB VMEM."""
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _merge_tile(s, col_idx, n_valid, vals_out, idx_out, run_vals, run_idx,
                s_scr, flag, *, k: int, t, n_tiles):
    """Threshold-gated running-top-k maintenance over one (Bq, T) tile.

    `run_vals`/`run_idx` hold the current top-k UNSORTED in lanes < k;
    lanes >= k are pinned at +inf so a row-min over the whole lane-aligned
    buffer reads theta (the running k-th best) in one narrow reduction.
    Each round extracts one per-row max and replaces each improving row's
    min slot; rounds after the first are skipped via the SMEM flag, so the
    common no-improvement tile pays ~2 full-width passes total."""
    lanes = run_vals.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, run_vals.shape, 1)

    @pl.when(t == 0)
    def _init():
        run_vals[:] = jnp.where(lane < k, NEG, POS)
        run_idx[:] = jnp.zeros_like(run_idx)

    s_scr[:] = jnp.where(col_idx < n_valid, s, NEG)
    theta = jnp.min(run_vals[:], axis=1, keepdims=True)  # (Bq, 1)
    flag[0] = jnp.any(s_scr[:] > theta).astype(jnp.int32)

    for _ in range(k):

        @pl.when(flag[0] != 0)
        def _round():
            sc = s_scr[:]
            rv = run_vals[:]
            minv = jnp.min(rv, axis=1, keepdims=True)  # theta, per row
            m = jnp.max(sc, axis=1, keepdims=True)  # per-row tile max
            # smallest global index attaining the max (ties -> earliest)
            picked = jnp.min(
                jnp.where(sc == m, col_idx, _I32_MAX), axis=1, keepdims=True
            )
            s_scr[:] = jnp.where(col_idx == picked, NEG, sc)
            # replace the improving rows' current-min slot
            pos = jnp.min(
                jnp.where(rv == minv, lane, lanes), axis=1, keepdims=True
            )
            ins = (lane == pos) & (m > minv)
            run_vals[:] = jnp.where(ins, m, rv)
            run_idx[:] = jnp.where(ins, picked, run_idx[:])
            theta2 = jnp.min(run_vals[:], axis=1, keepdims=True)
            flag[0] = jnp.any(s_scr[:] > theta2).astype(jnp.int32)

    @pl.when(t == n_tiles - 1)
    def _emit():
        # k extraction passes over the narrow 128-lane-aligned buffer,
        # once per query block: emit values descending (ties: the
        # smallest buffer lane; equal-value index order is unspecified,
        # matching the engine's rescore/argsort contract)
        cand_vals = jnp.where(lane < k, run_vals[:], NEG)
        cand_idx = run_idx[:]
        out_lane = jax.lax.broadcasted_iota(
            jnp.int32, (run_vals.shape[0], k), 1
        )
        vals = jnp.zeros((run_vals.shape[0], k), run_vals.dtype)
        idxs = jnp.zeros((run_vals.shape[0], k), run_idx.dtype)
        for j in range(k):
            m = jnp.max(cand_vals, axis=1, keepdims=True)
            a = jnp.min(
                jnp.where(cand_vals == m, lane, lanes),
                axis=1, keepdims=True,
            )
            pick_i = jnp.sum(
                jnp.where(lane == a, cand_idx, 0), axis=1, keepdims=True
            )
            vals = jnp.where(out_lane == j, m, vals)
            idxs = jnp.where(out_lane == j, pick_i, idxs)
            cand_vals = jnp.where(lane == a, NEG, cand_vals)
        vals_out[:] = vals
        idx_out[:] = idxs


def _topk_kernel(n_valid_ref, q_ref, k_ref, vals_out, idx_out,
                 run_vals, run_idx, s_scr, flag, *, k: int, tile: int,
                 precision=None):
    t = pl.program_id(1)  # key-tile index (inner, sequential)
    n_tiles = pl.num_programs(1)

    q = q_ref[:]  # (Bq, D)
    kt = k_ref[:]  # (T, D)
    s = jax.lax.dot_general(
        q, kt,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (Bq, T)

    base = t * tile
    col_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    _merge_tile(s, col_idx, n_valid_ref[0], vals_out, idx_out,
                run_vals, run_idx, s_scr, flag, k=k, t=t, n_tiles=n_tiles)


def _topk_i8_kernel(n_valid_ref, q_ref, qs_ref, k_ref, ks_ref, vals_out,
                    idx_out, run_vals, run_idx, s_scr, flag, *, k: int,
                    tile: int):
    """int8-quantized scores: q/k rows are symmetric per-row int8 with f32
    scales. The int8 values are cast to bf16 in VMEM — MXU bf16 x bf16
    multiplies are exact for 8-bit-significand integers and the f32
    accumulator is exact up to 2^24 (D=768 terms of <= 127*127 sums to
    < 2^24), so the tile dot reproduces the int32 integer product EXACTLY
    while reading 4x fewer HBM bytes than fp32 keys."""
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    q = q_ref[:].astype(jnp.bfloat16)  # (Bq, D) int8 values
    kt = k_ref[:].astype(jnp.bfloat16)  # (T, D)
    s = jax.lax.dot_general(
        q, kt,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Bq, T) exact integer products
    s = s * qs_ref[:] * ks_ref[:].reshape(1, -1)  # (Bq,1) * (1,T) scales

    base = t * tile
    col_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    _merge_tile(s, col_idx, n_valid_ref[0], vals_out, idx_out,
                run_vals, run_idx, s_scr, flag, k=k, t=t, n_tiles=n_tiles)


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile", "q_block", "interpret", "precision"),
)
def pallas_topk(queries, keys, n_valid, k: int = 5, tile: int = 512,
                q_block: int = 256, interpret: bool = False,
                precision: str = "high"):
    """Exact top-k of queries @ keys.T.

    queries: (Bq, D) f32 with Bq % q_block == 0; keys: (N, D) f32 with
    N % tile == 0 (callers pad; rows >= n_valid are masked).
    Grid = (query blocks, key tiles): the key-tile axis is innermost so the
    VMEM running top-k scratch carries across tiles of one query block.
    Returns (vals (Bq, k), idx (Bq, k))."""
    Bq, D = queries.shape
    N = keys.shape[0]
    assert N % tile == 0, f"keys ({N}) must be padded to tile ({tile})"
    q_block = min(q_block, Bq)
    assert Bq % q_block == 0, f"queries ({Bq}) must divide q_block ({q_block})"
    n_tiles = N // tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bq // q_block, n_tiles),
        in_specs=[
            pl.BlockSpec((q_block, D), lambda qi, t, nv: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda qi, t, nv: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_block, k), lambda qi, t, nv: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, k), lambda qi, t, nv: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_block, _run_lanes(k)), jnp.float32),
            pltpu.VMEM((q_block, _run_lanes(k)), jnp.int32),
            pltpu.VMEM((q_block, tile), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    # score matmul precision: "default" = single-pass bf16 operands
    # (fastest); "high"/"highest" = full-precision accumulation (Mosaic
    # supports only DEFAULT/HIGHEST, so "high" maps to HIGHEST here —
    # fp32-faithful like the FAISS IndexFlatIP this kernel replaces)
    kernel = functools.partial(
        _topk_kernel, k=k, tile=tile,
        precision=(
            jax.lax.Precision.DEFAULT
            if precision == "default"
            else jax.lax.Precision.HIGHEST
        ),
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bq, k), jnp.float32),
            jax.ShapeDtypeStruct((Bq, k), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_vmem_params(interpret),
    )(jnp.asarray([n_valid], jnp.int32), queries, keys)
    return vals, idx


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile", "q_block", "interpret"),
)
def pallas_topk_i8(q_i8, q_scales, keys_i8, k_scales, n_valid, k: int = 5,
                   tile: int = 512, q_block: int = 256,
                   interpret: bool = False):
    """Top-k over int8-quantized rows (symmetric per-row scales).

    q_i8: (Bq, D) int8; q_scales: (Bq, 1) f32; keys_i8: (N, D) int8;
    k_scales: (1, N) f32. Scores are EXACT integer dot products times the
    two scales (see _topk_i8_kernel) — the approximation is only the
    row quantization itself, which the engine's fp32 rescore pass absorbs.
    Shapes/padding contract identical to pallas_topk."""
    Bq, D = q_i8.shape
    N = keys_i8.shape[0]
    assert N % tile == 0, f"keys ({N}) must be padded to tile ({tile})"
    q_block = min(q_block, Bq)
    assert Bq % q_block == 0, f"queries ({Bq}) must divide q_block ({q_block})"
    n_tiles = N // tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bq // q_block, n_tiles),
        in_specs=[
            pl.BlockSpec((q_block, D), lambda qi, t, nv: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, 1), lambda qi, t, nv: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda qi, t, nv: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda qi, t, nv: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_block, k), lambda qi, t, nv: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, k), lambda qi, t, nv: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_block, _run_lanes(k)), jnp.float32),
            pltpu.VMEM((q_block, _run_lanes(k)), jnp.int32),
            pltpu.VMEM((q_block, tile), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(_topk_i8_kernel, k=k, tile=tile)
    vals, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bq, k), jnp.float32),
            jax.ShapeDtypeStruct((Bq, k), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_vmem_params(interpret),
    )(jnp.asarray([n_valid], jnp.int32), q_i8, q_scales, keys_i8, k_scales)
    return vals, idx


def quantize_rows_i8(x):
    """Symmetric per-row int8 quantization: returns (int8 values,
    (rows, 1) f32 scales). Zero rows get scale 1 (all-zero codes)."""
    x = np.asarray(x, dtype=np.float32)
    scales = np.abs(x).max(axis=1, keepdims=True) / 127.0
    scales = np.where(scales > 0, scales, 1.0).astype(np.float32)
    q = np.clip(np.rint(x / scales), -127, 127).astype(np.int8)
    return q, scales


def topk_search_pallas(query_feature, keys_feature, k: int,
                       tile: int = 512, query_chunk: int = 1024,
                       interpret: bool = False, precision: str = "high"):
    """numpy-in/numpy-out wrapper matching retrieval.engine.topk_search."""
    q = np.asarray(query_feature, dtype=np.float32)
    ks = np.asarray(keys_feature, dtype=np.float32)
    n_keys, d = ks.shape
    k_eff = min(k, n_keys)
    n_pad = ((n_keys + tile - 1) // tile) * tile
    ks_p = np.zeros((n_pad, d), np.float32)
    ks_p[:n_keys] = ks
    ks_j = jnp.asarray(ks_p)

    sims = np.empty((q.shape[0], k_eff), np.float32)
    idxs = np.empty((q.shape[0], k_eff), np.int64)
    q_block = 256
    for s in range(0, q.shape[0], query_chunk):
        qc = q[s : s + query_chunk]
        nb = qc.shape[0]
        qb = min(q_block, nb)
        pad = (-nb) % qb
        if pad:
            qc = np.concatenate([qc, np.zeros((pad, d), np.float32)], axis=0)
        v, i = pallas_topk(jnp.asarray(qc), ks_j, n_keys, k=k_eff, tile=tile,
                           q_block=qb, interpret=interpret,
                           precision=precision)
        sims[s : s + nb] = np.asarray(v)[:nb]
        idxs[s : s + nb] = np.asarray(i, dtype=np.int64)[:nb]
    return sims, idxs
