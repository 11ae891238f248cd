"""Train-step tests on the 8-device virtual CPU mesh: sharded global-batch
loss, gradient correctness vs single-device, freezing mask, loss descent.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bioscan_clip_tpu.losses.contrastive import multimodal_contrastive_loss
from bioscan_clip_tpu.models.bert import BarcodeBertDnaEncoder, BertConfig
from bioscan_clip_tpu.models.clip import MultiModalCLIP
from bioscan_clip_tpu.models.vit import ViT, ViTConfig
from bioscan_clip_tpu.parallel.mesh import create_mesh, shard_batch
from bioscan_clip_tpu.train.loop import make_train_step
from bioscan_clip_tpu.train.state import (
    count_trainable,
    create_train_state,
    param_labels,
)


def _tiny_model(lora_rank=2):
    return MultiModalCLIP(
        image_encoder=ViT(
            ViTConfig(
                image_size=16, patch_size=8, hidden_size=32, num_layers=2,
                num_heads=2, num_classes=24, lora_rank=lora_rank,
            ),
            dtype=jnp.float32,
        ),
        dna_encoder=BarcodeBertDnaEncoder(
            BertConfig(
                vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                intermediate_size=64, lora_rank=lora_rank,
                hidden_dropout=0.0, attention_dropout=0.0,
            ),
            output_dim=24,
            dtype=jnp.float32,
        ),
        language_encoder=None,
    )


def _batch(B=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(
            rng.standard_normal((B, 16, 16, 3)).astype(np.float32)
        ),
        "dna": jnp.asarray(rng.integers(0, 64, size=(B, 9)), jnp.int32),
        "labels": jnp.arange(B),
    }


def _init_state(model, disable_lora=False):
    batch = _batch(4)
    params = model.init(
        jax.random.PRNGKey(0), batch["image"], batch["dna"]
    )["params"]
    return create_train_state(
        model, params, lambda s: 1e-3, disable_lora=disable_lora
    )


def test_mesh_has_8_devices():
    mesh = create_mesh()
    assert mesh.devices.size == 8


def test_param_labels_lora_mode():
    model = _tiny_model()
    state = _init_state(model)
    labels = param_labels(state.params)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    trainable_paths = [
        "/".join(str(getattr(p, "key", p)) for p in path)
        for path, lab in flat
        if lab == "trainable"
    ]
    # LoRA adapters + ViT head + DNA decoder, nothing else
    assert any("lora_q_a" in p for p in trainable_paths)
    assert any("head" in p for p in trainable_paths)
    assert any("decoder" in p for p in trainable_paths)
    assert not any("qkv" in p and "lora" not in p for p in trainable_paths)
    assert not any("word_embeddings" in p for p in trainable_paths)
    tr, fr = count_trainable(state.params, labels)
    assert 0 < tr < fr


def test_frozen_params_do_not_move():
    model = _tiny_model()
    mesh = create_mesh()
    state = _init_state(model)
    before = jax.tree.map(np.asarray, state.params)
    step = make_train_step(model, mesh)
    batch = shard_batch(_batch(16), mesh)
    state2, loss = step(state, batch, jax.random.PRNGKey(1))
    after = state2.params
    # frozen: ViT qkv kernel unchanged
    np.testing.assert_array_equal(
        before["image_encoder"]["blocks"]["qkv"]["kernel"],
        np.asarray(after["image_encoder"]["blocks"]["qkv"]["kernel"]),
    )
    # trainable: LoRA B moved away from zero-init after one AdamW step
    assert np.abs(
        np.asarray(after["image_encoder"]["blocks"]["lora_q_b"])
    ).max() > 0
    assert np.isfinite(float(loss))


def test_sharded_matches_single_device():
    """Global-batch loss/grads on the 8-device mesh == single device."""
    model = _tiny_model()
    state = _init_state(model)
    batch = _batch(16)

    mesh8 = create_mesh()
    step8 = make_train_step(model, mesh8)
    s8, l8 = step8(state, shard_batch(batch, mesh8), jax.random.PRNGKey(7))

    mesh1 = create_mesh(devices=jax.devices()[:1])
    state1 = _init_state(model)  # same rng -> same init
    step1 = make_train_step(model, mesh1)
    s1, l1 = step1(state1, shard_batch(batch, mesh1), jax.random.PRNGKey(7))

    assert float(l8) == pytest.approx(float(l1), rel=1e-5)
    a = np.asarray(s8.params["image_encoder"]["blocks"]["lora_q_b"])
    b = np.asarray(s1.params["image_encoder"]["blocks"]["lora_q_b"])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_loss_descends():
    model = _tiny_model()
    mesh = create_mesh()
    state = _init_state(model)
    step = make_train_step(model, mesh)
    batch = shard_batch(_batch(16), mesh)
    losses = []
    for i in range(8):
        state, loss = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_disable_lora_trains_everything():
    model = _tiny_model(lora_rank=0)
    state = _init_state(model, disable_lora=True)
    labels = param_labels(state.params, disable_lora=True)
    assert all(l == "trainable" for l in jax.tree.leaves(labels))


def test_scan_train_step_matches_sequential():
    """K scanned steps == K sequential make_train_step calls (same dropout
    streams via fold_in(rng, state.step)), per-step losses returned."""
    from bioscan_clip_tpu.train.loop import (
        make_scan_train_step,
        stack_batches,
    )

    model = _tiny_model()
    mesh = create_mesh()
    K = 3
    batches = [_batch(16, seed=s) for s in range(K)]
    rng = jax.random.PRNGKey(5)

    state_a = _init_state(model)
    step = make_train_step(model, mesh)
    seq_losses = []
    for b in batches:
        state_a, loss = step(state_a, shard_batch(b, mesh), rng)
        seq_losses.append(float(loss))

    from bioscan_clip_tpu.parallel.mesh import shard_stacked_batches

    state_b = _init_state(model)
    scan_step = make_scan_train_step(model, mesh, steps_per_call=K)
    stacked = shard_stacked_batches(stack_batches(batches), mesh)
    state_b, losses = scan_step(state_b, stacked, rng)

    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(seq_losses), rtol=1e-5
    )
    assert int(state_b.step) == K
    for a, b in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )


def test_scan_train_step_same_batch():
    """same_batch=True scans K steps over ONE (B, ...) batch closure ==
    scanning a K-stacked repeat of that batch (identical per-step
    semantics, no (K, B, ...) input)."""
    from bioscan_clip_tpu.parallel.mesh import shard_stacked_batches
    from bioscan_clip_tpu.train.loop import (
        make_scan_train_step,
        stack_batches,
    )

    model = _tiny_model()
    mesh = create_mesh()
    K = 3
    b = _batch(16, seed=0)
    rng = jax.random.PRNGKey(5)

    state_a = _init_state(model)
    scan_step = make_scan_train_step(model, mesh, steps_per_call=K)
    stacked = shard_stacked_batches(stack_batches([b] * K), mesh)
    state_a, losses_a = scan_step(state_a, stacked, rng)

    state_b = _init_state(model)
    same_step = make_scan_train_step(
        model, mesh, steps_per_call=K, same_batch=True
    )
    state_b, losses_b = same_step(state_b, shard_batch(b, mesh), rng)

    np.testing.assert_allclose(
        np.asarray(losses_a), np.asarray(losses_b), rtol=1e-5
    )
    assert int(state_b.step) == K
    for x, y in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-5, atol=2e-6
        )


def test_train_epoch_scan_matches_sequential():
    """train_epoch with steps_per_call=2 over 3 batches (one 2-chunk + one
    tail) == plain sequential train_epoch: same final params, same per-step
    loss curve, same sample count."""
    from bioscan_clip_tpu.train.loop import (
        make_scan_train_step,
        train_epoch,
    )

    model = _tiny_model()
    mesh = create_mesh()
    batches = [
        {k: np.asarray(v) for k, v in _batch(16, seed=s).items()}
        for s in range(3)
    ]
    step = make_train_step(model, mesh)

    state_a, stats_a = train_epoch(
        _init_state(model), step, list(batches), mesh,
        jax.random.PRNGKey(9), epoch=0, total_epochs=1,
    )
    state_b, stats_b = train_epoch(
        _init_state(model), step, list(batches), mesh,
        jax.random.PRNGKey(9), epoch=0, total_epochs=1,
        steps_per_call=2,
        scan_step_factory=lambda k: make_scan_train_step(
            model, mesh, steps_per_call=k
        ),
    )
    assert int(state_a.step) == int(state_b.step) == 3
    np.testing.assert_allclose(
        stats_b["mean_loss"], stats_a["mean_loss"], rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )


def test_learnable_logit_scale():
    """mc.learnable_logit_scale: the log-temperature is a trainable param
    (no weight decay label), its gradient is nonzero in both the plain and
    the GradCache step, and it moves under training."""
    from bioscan_clip_tpu.train.loop import (
        make_gradcache_train_step,
        make_logit_scale_param,
        logit_scale_value,
    )

    model = _tiny_model()
    state0 = _init_state(model)
    params = make_logit_scale_param(dict(state0.params))
    assert float(jnp.exp(params["logit_scale"])) == pytest.approx(1 / 0.07)
    labels = param_labels(params)
    assert jax.tree.leaves(labels)  # sanity
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    scale_labels = [
        v for p, v in flat if getattr(p[0], "key", None) == "logit_scale"
    ]
    assert scale_labels == ["scale"]

    mesh = create_mesh()
    batch = shard_batch(_batch(16), mesh)
    step = make_train_step(model, mesh)
    before = float(params["logit_scale"])
    # fresh leaf copies per state: the jitted steps donate their state
    fresh = lambda: jax.tree.map(jnp.array, params)
    state = create_train_state(model, fresh(), lambda s: 1e-2)
    state2, loss = step(state, batch, jax.random.PRNGKey(0))
    after = float(state2.params["logit_scale"])
    assert after != before  # nonzero gradient reached the scale

    # GradCache path: the scale gradient flows through stage 2
    state = create_train_state(model, fresh(), lambda s: 1e-2)
    gstep = make_gradcache_train_step(model, mesh, accum_steps=2)
    state3, gloss = gstep(state, batch, jax.random.PRNGKey(0))
    assert float(state3.params["logit_scale"]) != before

    # helper falls back to the fixed value without the param
    assert float(
        logit_scale_value(dict(state0.params), 1 / 0.07)
    ) == pytest.approx(1 / 0.07)
