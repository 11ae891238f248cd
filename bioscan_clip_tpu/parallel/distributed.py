"""Multi-process (multi-host) execution — the jax.distributed wiring.

The reference's multi-accelerator launch is torch `mp.spawn` + NCCL process
groups + manual broadcast/all_gather (reference scripts/train_cl.py:42-46,
249-252). The TPU-native equivalent is ONE JAX process per host plus
`jax.distributed.initialize`; after that the same single-controller program
runs unchanged: `parallel/mesh.py`'s mesh spans every host's devices,
`shard_batch` assembles global arrays from per-process loader shards
(`jax.make_array_from_process_local_data`), and XLA places the gradient and
ClipLoss collectives on ICI/DCN automatically.

Triggers (first match wins):
- `args.tpu.distributed` config dict / `BSCAN_COORDINATOR` env:
  explicit {coordinator, num_processes, process_id} — the portable path
  (CPU multi-process tests use this; any cluster scheduler can set the env).
- `BSCAN_DISTRIBUTED=auto` env or `args.tpu.distributed: auto`:
  `jax.distributed.initialize()` with no arguments — JAX auto-detects the
  coordinator on Cloud TPU pods (TPU_WORKER_HOSTNAMES et al.).
- otherwise: no-op single-process.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple


def maybe_initialize_distributed(args=None, log=None) -> Tuple[int, int]:
    """Initialize jax.distributed when configured; return
    (process_index, process_count). Safe to call more than once (the second
    call is a no-op if already initialized)."""
    import jax

    def _say(msg):
        if log:
            log(msg)

    tpu_cfg = getattr(args, "tpu", None) if args is not None else None
    cfg = tpu_cfg.get("distributed", None) if tpu_cfg else None
    env = os.environ

    try:
        already = jax.process_count() > 1 or getattr(
            jax._src.distributed.global_state, "client", None
        ) is not None
    except Exception:
        already = False

    if not already:
        if cfg == "auto" or env.get("BSCAN_DISTRIBUTED") == "auto":
            jax.distributed.initialize()
            _say("jax.distributed auto-initialized (cloud TPU detection)")
        else:
            coordinator: Optional[str] = None
            nproc = pid = None
            if isinstance(cfg, dict):
                coordinator = cfg.get("coordinator")
                nproc = cfg.get("num_processes")
                pid = cfg.get("process_id")
            if coordinator is None:
                coordinator = env.get("BSCAN_COORDINATOR")
            if nproc is None:
                nproc = env.get("BSCAN_NUM_PROCESSES")
            if pid is None:
                pid = env.get("BSCAN_PROCESS_ID")
            if coordinator:
                jax.distributed.initialize(
                    coordinator_address=str(coordinator),
                    num_processes=int(nproc) if nproc is not None else None,
                    process_id=int(pid) if pid is not None else None,
                )
                _say(
                    f"jax.distributed initialized: process "
                    f"{jax.process_index()}/{jax.process_count()} via "
                    f"{coordinator}"
                )

    return jax.process_index(), jax.process_count()
