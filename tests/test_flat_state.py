"""FlatTrainState: packing round-trip, equivalence with the tree-based step,
loss descent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bioscan_clip_tpu.parallel.mesh import create_mesh, shard_batch
from bioscan_clip_tpu.train.flat_state import (
    FlatSpec,
    create_flat_train_state,
    make_flat_train_step,
)
from bioscan_clip_tpu.train.loop import make_train_step
from bioscan_clip_tpu.train.state import create_train_state, param_labels
from tests.test_train_step import _batch, _init_state, _tiny_model


def test_flatten_roundtrip():
    model = _tiny_model()
    params = _init_state(model).params
    spec = FlatSpec(params)
    flat = spec.flatten(params)
    assert flat.ndim == 1 and flat.size == spec.total
    rebuilt = spec.unflatten_into(params, flat)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(rebuilt)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_flat_matches_tree_step():
    model = _tiny_model()
    mesh = create_mesh(devices=jax.devices()[:1])
    batch = shard_batch(_batch(16), mesh)

    s_tree = _init_state(model)
    tree_step = make_train_step(model, mesh, remat=False)
    s_tree, l_tree = tree_step(s_tree, batch, jax.random.PRNGKey(5))

    params = _init_state(model).params
    s_flat = create_flat_train_state(params, lambda s: 1e-3)
    flat_step = make_flat_train_step(model, mesh, remat=False)
    s_flat, l_flat = flat_step(s_flat, batch, jax.random.PRNGKey(5))

    assert float(l_tree) == pytest.approx(float(l_flat), rel=1e-5)
    a = np.asarray(s_tree.params["image_encoder"]["blocks"]["lora_q_b"])
    b = np.asarray(s_flat.params["image_encoder"]["blocks"]["lora_q_b"])
    np.testing.assert_allclose(a, b, atol=1e-6)
    # frozen leaves untouched
    np.testing.assert_array_equal(
        np.asarray(params["image_encoder"]["blocks"]["qkv"]["kernel"]),
        np.asarray(s_flat.params["image_encoder"]["blocks"]["qkv"]["kernel"]),
    )


def test_flat_scan_matches_sequential():
    """K scanned flat steps == K sequential make_flat_train_step calls
    (same fold_in dropout streams), for both the stacked and the
    same_batch input forms."""
    from bioscan_clip_tpu.parallel.mesh import shard_stacked_batches
    from bioscan_clip_tpu.train.flat_state import make_flat_scan_train_step
    from bioscan_clip_tpu.train.loop import stack_batches

    model = _tiny_model()
    mesh = create_mesh()
    K = 3
    rng = jax.random.PRNGKey(5)
    params = _init_state(model).params

    b0 = _batch(16, seed=0)
    batches = [b0] * K

    s_seq = create_flat_train_state(params, lambda s: 1e-3)
    step = make_flat_train_step(model, mesh, remat=False)
    seq_losses = []
    for b in batches:
        s_seq, loss = step(s_seq, shard_batch(b, mesh), rng)
        seq_losses.append(float(loss))

    s_scan = create_flat_train_state(params, lambda s: 1e-3)
    kstep = make_flat_scan_train_step(model, mesh, steps_per_call=K)
    stacked = shard_stacked_batches(stack_batches(batches), mesh)
    s_scan, losses = kstep(s_scan, stacked, rng)
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(seq_losses), rtol=1e-5
    )
    assert int(s_scan.step) == K
    np.testing.assert_allclose(
        np.asarray(s_seq.flat), np.asarray(s_scan.flat), rtol=2e-5,
        atol=2e-6,
    )

    s_same = create_flat_train_state(params, lambda s: 1e-3)
    same_step = make_flat_scan_train_step(
        model, mesh, steps_per_call=K, same_batch=True
    )
    s_same, losses_same = same_step(s_same, shard_batch(b0, mesh), rng)
    np.testing.assert_allclose(
        np.asarray(losses_same), np.asarray(seq_losses), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_seq.flat), np.asarray(s_same.flat), rtol=2e-5,
        atol=2e-6,
    )


def test_flat_descends_multi_device():
    model = _tiny_model()
    mesh = create_mesh()
    params = _init_state(model).params
    state = create_flat_train_state(params, lambda s: 1e-3)
    step = make_flat_train_step(model, mesh)
    batch = shard_batch(_batch(16), mesh)
    losses = []
    for _ in range(6):
        state, loss = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 6


def test_flat_spec_counts():
    model = _tiny_model()
    params = _init_state(model).params
    labels = param_labels(params)
    n_trainable = sum(
        l.size
        for l, lab in zip(jax.tree.leaves(params), jax.tree.leaves(labels))
        if lab == "trainable"
    )
    assert FlatSpec(params).total == n_trainable
