"""Device mesh + sharding helpers — the single parallelism abstraction.

The reference's distributed layer is NCCL process groups + broadcast +
all_gather (train_cl.py:42-46, loss_func.py:58-91). Here all of it collapses
into one `jax.sharding.Mesh` with a `data` axis:

- parameter "broadcast" = replicated params under jit (free),
- gradient all-reduce = sharded autodiff (automatic, fixing the reference's
  missing grad sync),
- the ClipLoss feature all-gather = XLA-inserted ICI all-gather when the
  loss reads the globally-sharded embedding array.

The mesh reserves room for more axes (tensor/fsdp) so scaling beyond data
parallel is a config change, not a rewrite.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(mesh_shape: Optional[dict] = None, devices=None) -> Mesh:
    """Build the device mesh. Default: every device on one `data` axis.

    mesh_shape: optional {axis_name: size} dict (e.g. {"data": 4,
    "model": 2}); sizes must multiply to the device count (-1 = infer).
    """
    devices = devices if devices is not None else jax.devices()
    if not mesh_shape:
        mesh_shape = {DATA_AXIS: len(devices)}
    names = tuple(mesh_shape.keys())
    sizes = list(mesh_shape.values())
    n = len(devices)
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def mesh_spans_processes(mesh: Mesh) -> bool:
    """True when the mesh includes devices of more than one JAX process —
    its inputs must then be assembled from process-local shards. A
    process-LOCAL mesh (multi-host eval) takes the single-process path even
    when jax.process_count() > 1."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def _n_local_devices(mesh: Mesh) -> int:
    """Addressable devices of this mesh on this process."""
    return sum(
        1 for d in mesh.devices.flat if d.process_index == jax.process_index()
    )


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch (pytree of arrays) sharded over `data`.

    Multi-process (jax.process_count() > 1): `batch` is this process's LOCAL
    shard (the loader's process-strided rows, pipeline.py `process_index`),
    and the returned arrays are GLOBAL — assembled with
    `jax.make_array_from_process_local_data`, so the jitted step sees the
    full global batch exactly as in the single-process case. This replaces
    the reference's DistributedSampler + NCCL all_gather pair
    (dataset.py:41-48, loss_func.py:58-91)."""
    if mesh_spans_processes(mesh):
        n_local = _n_local_devices(mesh)
        leaves = jax.tree.leaves(batch)
        if leaves and n_local and leaves[0].shape[0] % n_local != 0:
            raise ValueError(
                f"local batch size {leaves[0].shape[0]} must be divisible "
                f"by this process's {n_local} mesh devices"
            )
        s = batch_sharding(mesh)
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)
            ),
            batch,
        )
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    leaves = jax.tree.leaves(batch)
    if leaves and leaves[0].shape[0] % n_dev != 0:
        raise ValueError(
            f"batch size {leaves[0].shape[0]} must be divisible by the "
            f"mesh's {n_dev} devices (training batches shard evenly; for "
            "uneven eval tails use shard_batch_padded)"
        )
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate_for_mesh(tree, mesh: Mesh):
    """Place a host pytree fully REPLICATED over the mesh — multi-process
    safe (every process must hold identical values, e.g. params built from
    the same PRNGKey or a restored checkpoint)."""
    s = replicated(mesh)
    if mesh_spans_processes(mesh):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)
            ),
            tree,
        )
    return jax.device_put(tree, s)


def shard_stacked_batches(batches, mesh: Mesh):
    """Device-put a (K, B, ...) stacked multi-step batch (train/loop.py
    stack_batches) with the BATCH axis (dim 1) sharded over `data` and the
    step axis replicated — lax.scan in make_scan_train_step iterates dim 0.
    Multi-process: dim 1 holds this process's LOCAL rows (see shard_batch)."""
    s = NamedSharding(mesh, P(None, DATA_AXIS))
    if mesh_spans_processes(mesh):
        n_local = _n_local_devices(mesh)
        leaves = jax.tree.leaves(batches)
        if leaves and n_local and leaves[0].shape[1] % n_local != 0:
            raise ValueError(
                f"local batch size {leaves[0].shape[1]} must be divisible "
                f"by this process's {n_local} mesh devices"
            )
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)
            ),
            batches,
        )
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    leaves = jax.tree.leaves(batches)
    if leaves and leaves[0].shape[1] % n_dev != 0:
        raise ValueError(
            f"batch size {leaves[0].shape[1]} must be divisible by the "
            f"mesh's {n_dev} devices"
        )
    return jax.tree.map(lambda x: jax.device_put(x, s), batches)


def shard_batch_padded(batch, mesh: Mesh):
    """Like shard_batch but pads the leading dim up to a multiple of the
    device count (repeating the last row) so uneven eval tails shard.
    Returns (sharded_batch, original_batch_size) — callers trim outputs
    back to the original size."""
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0]
    rem = n % n_dev
    if rem:
        pad = n_dev - rem

        def _pad(x):
            reps = np.concatenate(
                [np.asarray(x), np.repeat(np.asarray(x[-1:]), pad, axis=0)],
                axis=0,
            )
            return reps

        batch = jax.tree.map(_pad, batch)
    return shard_batch(batch, mesh), n
