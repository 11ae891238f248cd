"""Multi-host (multi-process) execution: 2 processes x 4 CPU devices must
produce the SAME losses and parameters as 1 process x 8 devices.

This is the rebuild's proof of the reference's multi-GPU contract
(reference scripts/train_cl.py:42-46, 249-252 mp.spawn + NCCL): the same
single-controller program runs across jax.distributed processes, with
loaders shipping process-local shards and shard_batch assembling global
arrays (parallel/mesh.py, parallel/distributed.py).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from bioscan_clip_tpu.parallel.mesh import create_mesh, shard_batch
from bioscan_clip_tpu.train.loop import make_train_step
from tests.test_train_step import _batch, _init_state, _tiny_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _reference_run(mode="plain", fixture=None):
    """1-process, 8-device ground truth (the conftest virtual mesh)."""
    import jax.numpy as jnp

    model = _tiny_model()
    state = _init_state(model)
    mesh = create_mesh()
    rng = jax.random.PRNGKey(0)
    if mode == "loader":
        # read the SAME process-strided shards the 2 workers read and
        # concatenate them in process order — exactly the global array
        # make_array_from_process_local_data assembles on the 2-process
        # mesh (process 0's devices lead the data axis)
        from bioscan_clip_tpu.data.dataset import construct_dataloader
        from bioscan_clip_tpu.models.clip import init_clip_params
        from bioscan_clip_tpu.train.loop import device_batch
        from bioscan_clip_tpu.train.state import create_train_state
        from tests.fixtures import SyntheticArgs
        from tests.test_data_pipeline import _tiny_full_model

        a = SyntheticArgs(fixture, batch_size=8)
        a.cfg.merge({"tpu": {"eval_host_parity_resize": False}})
        its = [
            iter(construct_dataloader(
                a, "no_split_and_seen_train", for_pre_train=True,
                shuffle=True, process_index=p, process_count=2,
            ))
            for p in range(2)
        ]
        fm = _tiny_full_model()
        params = init_clip_params(fm, jax.random.PRNGKey(0))
        fstate = create_train_state(fm, params, lambda s: 1e-3)
        step = make_train_step(fm, mesh)
        losses = []
        for _ in range(2):
            parts = [device_batch(next(it)) for it in its]
            b = jax.tree.map(
                lambda *xs: np.concatenate(xs, axis=0), *parts
            )
            fstate, loss = step(fstate, shard_batch(b, mesh), rng)
            losses.append(float(loss))
        for it in its:
            it.close()
        fp = float(
            sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree.leaves(fstate.params))
        )
        return losses, fp
    if mode == "scan":
        from bioscan_clip_tpu.parallel.mesh import shard_stacked_batches
        from bioscan_clip_tpu.train.loop import (
            make_scan_train_step,
            stack_batches,
        )

        stacked = shard_stacked_batches(
            stack_batches([_batch(16, seed=s) for s in range(2)]), mesh
        )
        kstep = make_scan_train_step(model, mesh, steps_per_call=2)
        state, loss_arr = kstep(state, stacked, rng)
        losses = [float(x) for x in np.asarray(loss_arr)]
        fp = float(
            sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree.leaves(state.params))
        )
        return losses, fp
    if mode in ("gradcache", "gradcache_chunk", "accum"):
        from bioscan_clip_tpu.train.loop import (
            make_accum_train_step,
            make_gradcache_train_step,
        )

        factory = (
            make_accum_train_step if mode == "accum"
            else make_gradcache_train_step
        )
        kw = {"s1_chunk": 8} if mode == "gradcache_chunk" else {}
        step = factory(model, mesh, accum_steps=4, **kw)
        losses = []
        for s in range(2):
            batch = shard_batch(_batch(16, seed=s), mesh)
            state, loss = step(state, batch, rng)
            losses.append(float(loss))
    else:
        step = make_train_step(model, mesh)
        losses = []
        for _ in range(2):
            batch = shard_batch(_batch(16), mesh)
            state, loss = step(state, batch, rng)
            losses.append(float(loss))
    fp = float(
        sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(state.params))
    )
    return losses, fp


@pytest.mark.slow
@pytest.mark.parametrize(
    "mode", ["plain", "scan", "gradcache", "gradcache_chunk", "accum",
             "loader"]
)
def test_two_process_matches_single_process(tmp_path, mode):
    fixture = None
    if mode == "loader":
        from tests.fixtures import build_synthetic_dataset

        fixture = str(tmp_path / "mp_fixture.hdf5")
        build_synthetic_dataset(fixture, n_classes=4, per_class=16)
    ref_losses, ref_fp = _reference_run(mode, fixture=fixture)

    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "mp_worker.py")

    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"proc{pid}.json"
        outs.append(out)
        argv = [sys.executable, worker, str(pid), "2", str(port), str(out),
                mode]
        if fixture:
            argv.append(fixture)
        procs.append(
            subprocess.Popen(
                argv,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, stderr.decode()[-3000:]

    results = [json.loads(o.read_text()) for o in outs]
    # both processes observe identical (replicated) losses and params
    np.testing.assert_allclose(
        results[0]["losses"], results[1]["losses"], rtol=1e-6
    )
    # ...and they match the single-process 8-device run
    np.testing.assert_allclose(
        results[0]["losses"], ref_losses, rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        results[0]["fingerprint"], ref_fp, rtol=2e-5
    )
