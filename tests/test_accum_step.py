"""Gradient-accumulation train step: runs, descends, and matches the plain
step when each microbatch IS the full batch (accum_steps=1)."""

import jax
import numpy as np
import pytest

from bioscan_clip_tpu.parallel.mesh import create_mesh, shard_batch
from bioscan_clip_tpu.train.loop import make_accum_train_step, make_train_step
from tests.test_train_step import _batch, _init_state, _tiny_model


def test_accum_one_matches_plain():
    model = _tiny_model()
    mesh = create_mesh(devices=jax.devices()[:1])
    batch = shard_batch(_batch(16), mesh)

    s1 = _init_state(model)
    plain = make_train_step(model, mesh, remat=False)
    s1, l1 = plain(s1, batch, jax.random.PRNGKey(3))

    s2 = _init_state(model)
    accum = make_accum_train_step(model, mesh, accum_steps=1, remat=False)
    s2, l2 = accum(s2, batch, jax.random.PRNGKey(3))

    assert float(l1) == pytest.approx(float(l2), rel=1e-5)
    a = np.asarray(s1.params["image_encoder"]["blocks"]["lora_q_b"])
    b = np.asarray(s2.params["image_encoder"]["blocks"]["lora_q_b"])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_accum_descends():
    model = _tiny_model()
    mesh = create_mesh(devices=jax.devices()[:2])
    state = _init_state(model)
    step = make_accum_train_step(model, mesh, accum_steps=4)
    batch = shard_batch(_batch(16), mesh)
    losses = []
    for _ in range(6):
        state, loss = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 6


def test_gradcache_matches_full_batch_gradients():
    """GradCache accumulation == full-batch step EXACTLY (same negatives,
    same gradients) — the reference's batch-400 ClipLoss semantics under
    memory-bounded accumulation (VERDICT r1 item 5)."""
    from bioscan_clip_tpu.train.loop import make_gradcache_train_step

    model = _tiny_model()
    mesh = create_mesh(devices=jax.devices()[:1])
    batch = shard_batch(_batch(16), mesh)

    s1 = _init_state(model)
    plain = make_train_step(model, mesh)
    s1, l1 = plain(s1, batch, jax.random.PRNGKey(3))

    s2 = _init_state(model)
    gc = make_gradcache_train_step(model, mesh, accum_steps=4)
    s2, l2 = gc(s2, batch, jax.random.PRNGKey(3))

    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    for a, b in zip(
        jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
        )


def test_gradcache_descends_on_mesh():
    from bioscan_clip_tpu.train.loop import make_gradcache_train_step

    model = _tiny_model()
    mesh = create_mesh()
    state = _init_state(model)
    step = make_gradcache_train_step(model, mesh, accum_steps=2)
    batch = shard_batch(_batch(16), mesh)
    losses = []
    for _ in range(6):
        state, loss = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_scan_gradcache_matches_sequential_gradcache():
    """tpu.steps_per_call x tpu.accum_steps: K GradCache macro-steps in ONE
    dispatch == K sequential GradCache dispatches (VERDICT r2 item 3)."""
    import jax.numpy as jnp

    from bioscan_clip_tpu.parallel.mesh import shard_stacked_batches
    from bioscan_clip_tpu.train.loop import (
        make_gradcache_train_step,
        stack_batches,
    )

    model = _tiny_model()
    mesh = create_mesh(devices=jax.devices()[:2])
    K = 3
    batches = [_batch(16, seed=s) for s in range(K)]
    rng = jax.random.PRNGKey(5)

    s1 = _init_state(model)
    gc = make_gradcache_train_step(model, mesh, accum_steps=4)
    seq_losses = []
    for b in batches:
        s1, loss = gc(s1, shard_batch(b, mesh), rng)
        seq_losses.append(float(loss))

    s2 = _init_state(model)
    gck = make_gradcache_train_step(
        model, mesh, accum_steps=4, steps_per_call=K
    )
    stacked = shard_stacked_batches(stack_batches(batches), mesh)
    s2, losses_k = gck(s2, stacked, rng)

    np.testing.assert_allclose(
        np.asarray(losses_k), np.asarray(seq_losses), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
        )
    assert int(s2.step) == K


def test_same_batch_scan_gradcache_matches_stacked():
    """same_batch GradCache scan (xs=None loop constant) == the stacked
    (K, B, ...) scan fed K copies of the one batch — the synthetic-bench
    form used by `bench.py --train --gradcache A --scan K --same-batch`."""
    from bioscan_clip_tpu.parallel.mesh import shard_stacked_batches
    from bioscan_clip_tpu.train.loop import (
        make_gradcache_train_step,
        stack_batches,
    )

    model = _tiny_model()
    mesh = create_mesh(devices=jax.devices()[:2])
    K = 3
    b = _batch(16, seed=11)
    rng = jax.random.PRNGKey(9)

    s1 = _init_state(model)
    gck = make_gradcache_train_step(
        model, mesh, accum_steps=4, steps_per_call=K
    )
    stacked = shard_stacked_batches(stack_batches([b] * K), mesh)
    s1, losses_stacked = gck(s1, stacked, rng)

    s2 = _init_state(model)
    gcs = make_gradcache_train_step(
        model, mesh, accum_steps=4, steps_per_call=K, same_batch=True
    )
    s2, losses_same = gcs(s2, shard_batch(b, mesh), rng)

    np.testing.assert_allclose(
        np.asarray(losses_same), np.asarray(losses_stacked), rtol=1e-5
    )
    for a, c in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=1e-6, rtol=1e-5
        )
    assert int(s2.step) == K


def test_gradcache_merged_stage1_matches_unmerged():
    """merged_model (rank-0 towers, adapters folded per macro-step) in
    GradCache's stage 1 must reproduce the unmerged run: same loss, same
    updated params (fp32 CPU: the fold is exact reassociation)."""
    from bioscan_clip_tpu.train.loop import make_gradcache_train_step

    model = _tiny_model()
    merged = _tiny_model(lora_rank=0)
    mesh = create_mesh(devices=jax.devices()[:1])
    batch = shard_batch(_batch(16), mesh)

    s1 = _init_state(model)
    gc = make_gradcache_train_step(model, mesh, accum_steps=4)
    s1, l1 = gc(s1, batch, jax.random.PRNGKey(3))

    s2 = _init_state(model)
    gcm = make_gradcache_train_step(
        model, mesh, accum_steps=4, merged_model=merged
    )
    s2, l2 = gcm(s2, batch, jax.random.PRNGKey(3))

    assert float(l1) == pytest.approx(float(l2), rel=1e-5)
    for a, b in zip(
        jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


def test_gradcache_merged_matches_full_batch_step():
    """...and still equals the plain full-batch step (the GradCache
    contract end-to-end with the merged stage 1)."""
    from bioscan_clip_tpu.train.loop import make_gradcache_train_step

    model = _tiny_model()
    merged = _tiny_model(lora_rank=0)
    mesh = create_mesh(devices=jax.devices()[:1])
    batch = shard_batch(_batch(16), mesh)

    s1 = _init_state(model)
    plain = make_train_step(model, mesh)
    s1, l1 = plain(s1, batch, jax.random.PRNGKey(3))

    s2 = _init_state(model)
    gcm = make_gradcache_train_step(
        model, mesh, accum_steps=4, merged_model=merged
    )
    s2, l2 = gcm(s2, batch, jax.random.PRNGKey(3))

    assert float(l1) == pytest.approx(float(l2), rel=1e-5)
    for a, b in zip(
        jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )
