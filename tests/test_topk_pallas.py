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
