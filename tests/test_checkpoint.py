"""Orbax checkpoint round-trip: full train state (params+opt+step) resume."""

import jax
import jax.numpy as jnp
import numpy as np

from bioscan_clip_tpu.parallel.mesh import create_mesh, shard_batch
from bioscan_clip_tpu.train.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)
from bioscan_clip_tpu.train.loop import make_train_step
from tests.test_train_step import _batch, _init_state, _tiny_model


def test_full_state_roundtrip(tmp_path):
    model = _tiny_model()
    mesh = create_mesh()
    state = _init_state(model)
    step = make_train_step(model, mesh)
    batch = shard_batch(_batch(16), mesh)
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(0))

    save_checkpoint(str(tmp_path), state, name="last")

    # fresh state, then restore
    state2 = _init_state(model)
    assert int(state2.step) == 0
    state2 = restore_checkpoint(str(tmp_path), state2, name="last", mesh=mesh)
    assert int(state2.step) == 3
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed training continues identically
    s_a, l_a = step(state, batch, jax.random.PRNGKey(0))
    s_b, l_b = step(state2, batch, jax.random.PRNGKey(0))
    assert float(l_a) == float(l_b)


def test_async_save_roundtrip(tmp_path):
    """block=False returns immediately; wait_for_checkpoints() joins the
    background write, after which restore sees the full state."""
    from bioscan_clip_tpu.train.checkpoint import wait_for_checkpoints

    model = _tiny_model()
    mesh = create_mesh()
    state = _init_state(model)
    step = make_train_step(model, mesh)
    batch = shard_batch(_batch(16), mesh)
    state, _ = step(state, batch, jax.random.PRNGKey(0))

    save_checkpoint(str(tmp_path), state, name="last", block=False)
    wait_for_checkpoints()

    state2 = restore_checkpoint(
        str(tmp_path), _init_state(model), name="last", mesh=mesh
    )
    assert int(state2.step) == 1
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(state2.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
