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


def _aug_model_and_batch(B=8):
    """224-input tiny model with REAL dropout on the DNA tower (the image
    tower stays dropout-free, as in the flagship ViT) + a device-aug u8
    batch — exercises the per-microbatch rng streams that
    s1_image_batch/cache_aug must preserve exactly."""
    import jax.numpy as jnp

    from bioscan_clip_tpu.models.bert import BarcodeBertDnaEncoder, BertConfig
    from bioscan_clip_tpu.models.clip import MultiModalCLIP
    from bioscan_clip_tpu.models.vit import ViT, ViTConfig
    from bioscan_clip_tpu.train.state import create_train_state

    model = MultiModalCLIP(
        image_encoder=ViT(
            ViTConfig(
                image_size=224, patch_size=56, hidden_size=32, num_layers=2,
                num_heads=2, num_classes=24, lora_rank=2,
            ),
            dtype=jnp.float32,
        ),
        dna_encoder=BarcodeBertDnaEncoder(
            BertConfig(
                vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                intermediate_size=64, lora_rank=2,
                hidden_dropout=0.1, attention_dropout=0.1,
            ),
            output_dim=24,
            dtype=jnp.float32,
        ),
        language_encoder=None,
    )
    rng = np.random.default_rng(0)
    batch = {
        # pipeline-shaped: shorter-side-256 resize output, device RRC crop
        "image_u8": jnp.asarray(
            rng.integers(0, 256, size=(B, 256, 341, 3), dtype=np.uint8)
        ),
        "dna": jnp.asarray(rng.integers(0, 64, size=(B, 9)), np.int32),
        "labels": jnp.arange(B),
    }
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 224, 224, 3), jnp.float32),
        batch["dna"][:2],
    )["params"]
    state = create_train_state(model, params, lambda s: 1e-3)
    return model, batch, state


@pytest.mark.parametrize("s1_img,c_aug", [(8, False), (4, True), (0, True)])
def test_gradcache_s1_image_batch_and_cache_aug_match_ungrouped(
    s1_img, c_aug
):
    """Grouped stage-1 image forwards / cached aug images == the ungrouped
    GradCache step bit-for-bit in the rng streams (dropout ACTIVE on the
    DNA tower, device aug from u8): only image-tower batching rounding may
    differ."""
    from bioscan_clip_tpu.train.loop import make_gradcache_train_step

    model, batch, state0 = _aug_model_and_batch()
    mesh = create_mesh(devices=jax.devices()[:1])
    b = shard_batch(batch, mesh)

    gc_ref = make_gradcache_train_step(model, mesh, accum_steps=4)
    s_ref, l_ref = gc_ref(state0, b, jax.random.PRNGKey(3))

    _, _, state1 = _aug_model_and_batch()
    gc_new = make_gradcache_train_step(
        model, mesh, accum_steps=4, s1_image_batch=s1_img, cache_aug=c_aug
    )
    s_new, l_new = gc_new(state1, b, jax.random.PRNGKey(3))

    assert float(l_ref) == pytest.approx(float(l_new), rel=1e-5)
    for a, c in zip(
        jax.tree.leaves(s_ref.params), jax.tree.leaves(s_new.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=1e-6, rtol=1e-5
        )


def test_gradcache_s1_image_batch_must_divide():
    from bioscan_clip_tpu.train.loop import make_gradcache_train_step

    model, batch, state = _aug_model_and_batch()
    mesh = create_mesh(devices=jax.devices()[:1])
    gc = make_gradcache_train_step(
        model, mesh, accum_steps=4, s1_image_batch=3
    )
    with pytest.raises(ValueError, match="must divide"):
        gc(state, shard_batch(batch, mesh), jax.random.PRNGKey(3))


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


@pytest.mark.parametrize("chunks", [(2, 8), (4, 8)])
def test_gradcache_s1_chunk_grouping_invariant(chunks):
    """s1_chunk switches the step to row-keyed (batch-composition-
    invariant) dropout: ANY two chunk sizes produce the same masks — the
    loss and the updated params must agree to compute-dtype rounding
    (models/common.py ps_dropout, make_gradcache_train_step docstring).
    Dropout is ACTIVE on the DNA tower. Images ship PRE-CROPPED (the
    host-crop recipe): the device transform is then draw-free, so the
    whole step is grouping-invariant; with device-side aug the crop draws
    are chunk-keyed (statistically equivalent, internally exact — stage 3
    reuses stage 1's images) and only dropout is invariant."""
    import jax.numpy as jnp

    from bioscan_clip_tpu.train.loop import make_gradcache_train_step

    model, batch, state_a = _aug_model_and_batch()
    rng = np.random.default_rng(7)
    batch = dict(batch)
    batch["image_u8"] = jnp.asarray(
        rng.integers(0, 256, size=(8, 224, 224, 3), dtype=np.uint8)
    )
    mesh = create_mesh(devices=jax.devices()[:1])
    b = shard_batch(batch, mesh)
    c1, c2 = chunks

    gc1 = make_gradcache_train_step(model, mesh, accum_steps=4, s1_chunk=c1)
    s1_, l1 = gc1(state_a, b, jax.random.PRNGKey(3))

    _, _, state_b = _aug_model_and_batch()
    gc2 = make_gradcache_train_step(model, mesh, accum_steps=4, s1_chunk=c2)
    s2_, l2 = gc2(state_b, b, jax.random.PRNGKey(3))

    assert float(l1) == pytest.approx(float(l2), rel=1e-5)
    for a, c in zip(
        jax.tree.leaves(s1_.params), jax.tree.leaves(s2_.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=1e-6, rtol=1e-5
        )


def test_gradcache_s1_chunk_dropout_differs_from_legacy():
    """Row-keyed masks are a DIFFERENT (equally valid) draw than the flax
    rng stream — the s1_chunk step must still descend and stay finite."""
    from bioscan_clip_tpu.train.loop import make_gradcache_train_step

    model, batch, state = _aug_model_and_batch()
    mesh = create_mesh(devices=jax.devices()[:1])
    b = shard_batch(batch, mesh)
    gc = make_gradcache_train_step(model, mesh, accum_steps=4, s1_chunk=8)
    losses = []
    for _ in range(5):
        state, loss = gc(state, b, jax.random.PRNGKey(0))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_gradcache_s1_chunk_matches_full_batch_no_dropout():
    """With dropout-free towers, the fully-chunked stage 1 is pure
    plumbing: the step must equal the plain full-batch step exactly
    (the original GradCache contract)."""
    from bioscan_clip_tpu.train.loop import make_gradcache_train_step

    model = _tiny_model()
    mesh = create_mesh(devices=jax.devices()[:1])
    batch = shard_batch(_batch(16), mesh)

    s_ref = _init_state(model)
    plain = make_train_step(model, mesh)
    s_ref, l_ref = plain(s_ref, batch, jax.random.PRNGKey(3))

    s_new = _init_state(model)
    gc = make_gradcache_train_step(model, mesh, accum_steps=4, s1_chunk=8)
    s_new, l_new = gc(s_new, batch, jax.random.PRNGKey(3))

    assert float(l_ref) == pytest.approx(float(l_new), rel=1e-5)
    for a, c in zip(
        jax.tree.leaves(s_ref.params), jax.tree.leaves(s_new.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=1e-6, rtol=1e-5
        )


def test_gradcache_s1_chunk_must_divide():
    from bioscan_clip_tpu.train.loop import make_gradcache_train_step

    model, batch, state = _aug_model_and_batch()
    mesh = create_mesh(devices=jax.devices()[:1])
    gc = make_gradcache_train_step(model, mesh, accum_steps=4, s1_chunk=3)
    with pytest.raises(ValueError, match="must divide"):
        gc(state, shard_batch(batch, mesh), jax.random.PRNGKey(3))
