"""Pallas fused top-k kernel vs brute force (interpret mode on CPU)."""

import numpy as np
import pytest

from bioscan_clip_tpu.ops.topk_pallas import topk_search_pallas
from bioscan_clip_tpu.retrieval.engine import l2norm_np


def _brute(q, ks, k):
    sims = q @ ks.T
    idx = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(sims, idx, axis=1), idx


@pytest.mark.parametrize("n_keys", [100, 512, 1300])
def test_pallas_topk_matches_bruteforce(n_keys):
    rng = np.random.default_rng(0)
    q = l2norm_np(rng.standard_normal((16, 32)).astype(np.float32))
    ks = l2norm_np(rng.standard_normal((n_keys, 32)).astype(np.float32))
    sims, idx = topk_search_pallas(q, ks, 5, tile=256, interpret=True)
    bs, bi = _brute(q, ks, 5)
    np.testing.assert_allclose(sims, bs, atol=1e-5)
    re_sims = np.take_along_axis(q @ ks.T, idx, axis=1)
    np.testing.assert_allclose(re_sims, bs, atol=1e-5)


def test_pallas_topk_all_negative():
    rng = np.random.default_rng(1)
    q = np.ones((4, 16), np.float32)
    ks = -np.abs(rng.standard_normal((100, 16)).astype(np.float32))
    sims, idx = topk_search_pallas(q, ks, 3, tile=64, interpret=True)
    assert (sims < 0).all()
    bs, _ = _brute(q, ks, 3)
    np.testing.assert_allclose(sims, bs, atol=1e-5)


def test_pallas_topk_sorted_descending():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((8, 16)).astype(np.float32)
    ks = rng.standard_normal((256, 16)).astype(np.float32)
    sims, _ = topk_search_pallas(q, ks, 5, tile=128, interpret=True)
    assert (np.diff(sims, axis=1) <= 1e-6).all()


# ---- adversarial cases for the threshold-gated merge (VERDICT r3 weak #4) --
# The gating's documented worst case is keys sorted ASCENDING (every tile
# improves the running top-k -> k extraction rounds per tile); ties exercise
# the picked/min-lane insert logic; k > 128 crosses the lane-aligned scratch
# boundary; mixed tiles across query blocks exercise per-block SMEM flags.

import jax.numpy as jnp

from bioscan_clip_tpu.ops.topk_pallas import (
    pallas_topk,
    pallas_topk_i8,
    quantize_rows_i8,
)


def _ascending_keys(n, d, rng):
    """Keys whose inner product with u = e0 strictly ascends with index:
    every tile beats the running theta -> the gated merge's worst case."""
    u = np.zeros(d, np.float32)
    u[0] = 1.0
    v = np.zeros(d, np.float32)
    v[1] = 1.0
    # angles from 89 deg down to ~0: cos ascending, all keys unit-norm
    ang = np.linspace(1.55, 0.001, n).astype(np.float32)
    ks = np.cos(ang)[:, None] * u + np.sin(ang)[:, None] * v
    # tiny orthogonal noise keeps rows distinct in the other dims
    ks[:, 2:] += 0.001 * rng.standard_normal((n, d - 2)).astype(np.float32)
    return l2norm_np(ks)


def test_ascending_sorted_keys_worst_case():
    rng = np.random.default_rng(10)
    ks = _ascending_keys(512, 32, rng)
    q = l2norm_np(
        np.eye(1, 32, dtype=np.float32)
        + 0.01 * rng.standard_normal((8, 32)).astype(np.float32)
    )
    sims, idx = topk_search_pallas(q, ks, 5, tile=64, interpret=True)
    bs, bi = _brute(q, ks, 5)
    np.testing.assert_allclose(sims, bs, atol=1e-5)
    np.testing.assert_array_equal(idx, bi)


def test_ascending_sorted_keys_int8():
    rng = np.random.default_rng(11)
    ks = _ascending_keys(256, 32, rng)
    q = l2norm_np(
        np.eye(1, 32, dtype=np.float32)
        + 0.01 * rng.standard_normal((4, 32)).astype(np.float32)
    )
    q8, qs = quantize_rows_i8(q)
    k8, ksc = quantize_rows_i8(ks)
    vals, idx = pallas_topk_i8(
        q8, qs, k8, ksc.T.copy(), 256, k=5, tile=64, q_block=4,
        interpret=True,
    )
    ref = (
        q8.astype(np.int32) @ k8.astype(np.int32).T
    ).astype(np.float32) * qs * ksc.T
    ref_sorted = np.sort(ref, axis=1)[:, ::-1][:, :5]
    np.testing.assert_allclose(np.asarray(vals), ref_sorted, rtol=0, atol=0)
    picked = np.take_along_axis(ref, np.asarray(idx).astype(np.int64), 1)
    np.testing.assert_allclose(np.asarray(vals), picked, rtol=0, atol=0)


def test_all_equal_ties():
    """Every key identical: scores tie everywhere. The merge must fill k
    DISTINCT earliest indices (picked = min index per round; equal scores
    never displace the running buffer) — brute stable-argsort semantics."""
    d = 16
    row = l2norm_np(np.ones((1, d), np.float32))
    ks = np.repeat(row, 300, axis=0)
    q = np.repeat(row, 4, axis=0)
    sims, idx = topk_search_pallas(q, ks, 5, tile=64, interpret=True)
    np.testing.assert_array_equal(
        idx, np.tile(np.arange(5), (4, 1))
    )
    np.testing.assert_allclose(sims, np.full((4, 5), 1.0), atol=1e-6)


def test_tie_blocks_across_tiles():
    """Blocks of equal scores spanning tile boundaries: the k winners are
    the earliest indices of the best block even when a tile holds only
    ties at theta (no improvement -> gated skip must not drop them)."""
    d = 16
    rng = np.random.default_rng(12)
    base = l2norm_np(rng.standard_normal((1, d)).astype(np.float32))
    near = l2norm_np(
        base + 0.3 * rng.standard_normal((1, d)).astype(np.float32)
    )
    # 70 copies of `near` then 130 copies of `base` (crosses the 64-tile
    # boundary twice); query = base -> winners are indices 70..74
    ks = np.concatenate([np.repeat(near, 70, 0), np.repeat(base, 130, 0)])
    q = base.copy()
    sims, idx = topk_search_pallas(q, ks, 5, tile=64, interpret=True)
    np.testing.assert_array_equal(idx[0], np.arange(70, 75))
    np.testing.assert_allclose(sims[0], np.ones(5), atol=1e-6)


def test_k_crosses_lane_scratch_boundary():
    """k=129 > 128 lanes: the running buffer spans two lane registers;
    theta (row-min) and the emit sweep must read across the boundary."""
    rng = np.random.default_rng(13)
    q = l2norm_np(rng.standard_normal((4, 24)).astype(np.float32))
    ks = l2norm_np(rng.standard_normal((400, 24)).astype(np.float32))
    k = 129
    sims, idx = topk_search_pallas(q, ks, k, tile=128, interpret=True)
    bs, bi = _brute(q, ks, k)
    np.testing.assert_allclose(sims, bs, atol=1e-5)
    re = np.take_along_axis(q @ ks.T, idx.astype(np.int64), axis=1)
    np.testing.assert_allclose(re, bs, atol=1e-5)
    # indices are distinct per row
    assert all(len(set(row)) == k for row in np.asarray(idx))


def test_mixed_improving_tiles_multi_query_block():
    """Two query blocks with OPPOSITE improvement patterns: block A's best
    keys live in the last tile (every tile improves), block B's in the
    first (later tiles all gate out). The per-block scratch/flag must not
    leak across grid rows."""
    rng = np.random.default_rng(14)
    d = 32
    n = 256  # 4 tiles of 64
    a = np.zeros(d, np.float32)
    a[0] = 1.0
    b = np.zeros(d, np.float32)
    b[1] = 1.0
    ks = 0.01 * rng.standard_normal((n, d)).astype(np.float32)
    # block A targets: ascending towards `a` (last tile best)
    ks[:, 0] += np.linspace(0.0, 1.0, n).astype(np.float32)
    # block B targets: descending from `b` (first tile best)
    ks[:, 1] += np.linspace(1.0, 0.0, n).astype(np.float32)
    ks = l2norm_np(ks)
    qa = np.repeat(a[None], 8, 0) + 0.001 * rng.standard_normal((8, d))
    qb = np.repeat(b[None], 8, 0) + 0.001 * rng.standard_normal((8, d))
    q = l2norm_np(np.concatenate([qa, qb]).astype(np.float32))

    vals, idx = pallas_topk(
        jnp.asarray(q), jnp.asarray(ks), n, k=5, tile=64, q_block=8,
        interpret=True,
    )
    bs, bi = _brute(q, ks, 5)
    np.testing.assert_allclose(np.asarray(vals), bs, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), bi)
    # sanity of the construction: A's winners late, B's early
    assert np.asarray(idx)[0].min() >= n - 64
    assert np.asarray(idx)[8].max() < 64


def test_int8_ties_and_mixed_tiles():
    """Tie-heavy int8 input across tiles (quantization collapses near-equal
    rows to EXACT ties): distinct earliest indices, exact integer scores."""
    rng = np.random.default_rng(15)
    d = 32
    row = l2norm_np(np.ones((1, d), np.float32))
    ks = np.repeat(row, 192, axis=0)
    q = np.repeat(row, 8, axis=0)
    q8, qs = quantize_rows_i8(q)
    k8, ksc = quantize_rows_i8(ks)
    vals, idx = pallas_topk_i8(
        q8, qs, k8, ksc.T.copy(), 192, k=7, tile=64, q_block=8,
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(idx), np.tile(np.arange(7), (8, 1))
    )
    ref = (
        q8.astype(np.int32) @ k8.astype(np.int32).T
    ).astype(np.float32) * qs * ksc.T
    np.testing.assert_allclose(
        np.asarray(vals), ref[:, :7], rtol=0, atol=0
    )
