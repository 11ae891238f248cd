"""Shared tower knobs.

`ln_dtype()` — LayerNorm compute dtype for the towers. Default fp32: exact
checkpoint-parity numerics and training stability (SURVEY.md §7 hard part
1). `BSCAN_FAST_LN=1` opts inference into bf16 LN compute: the LNs are
HBM-bandwidth-bound elementwise passes over the full (B, N, D) residual
stream, so halving their traffic buys extraction throughput at a small,
measured embedding drift (tests/test_fast_ln.py bounds it; retrieval
near-ties can flip, so the parity eval path must leave this OFF).
"""

from __future__ import annotations

import os

import jax.numpy as jnp


def ln_dtype():
    return (
        jnp.bfloat16
        if os.environ.get("BSCAN_FAST_LN", "0") == "1"
        else jnp.float32
    )
