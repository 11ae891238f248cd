"""Isolate the LayerNorm dx cost on-chip: autodiff vs a hand-written VJP.

The B=128 train-step trace attributed ~65 ms/step to LayerNorm-adjacent
backward fusions (PERF_NOTES round 3) and the "wide" remat policy falsified
the recompute hypothesis — so the cost, if real, is the dx math itself.
This probe times, standalone at flagship shapes, K scanned iterations of:

  a) jax.grad through flax-semantics LN (fp32 stats over bf16 x)
  b) the closed-form dx (rstd * (dyg - mean(dyg) - xhat*mean(dyg*xhat)))
     computed from saved (mu, rstd) — what a custom_vjp would run

If (a) ~= (b), XLA's autodiff is already optimal and a custom LN VJP is
dead weight; if (a) >> (b), wire the custom VJP into models/common.py.

    python tools/smoke_ln_bwd_tpu.py --tpu [--batch 64] [--n 197] [--k 200]

SAFETY: defaults to CPU. The ambient sitecustomize force-registers the axon
TPU plugin in every interpreter (JAX_PLATFORMS env is NOT honored), and an
ad-hoc TPU dial can crash a concurrently running bench's worker (ROUND3.md
environment incident) — pass --tpu only when nothing else is on the chip.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax import lax


def ln_fwd_f32(x, g, b, eps=1e-6):
    """flax nn.LayerNorm(dtype=fp32) semantics on bf16 input."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    mu2 = (xf * xf).mean(-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    return (xf - mu) * (lax.rsqrt(var + eps) * g) + b


def manual_dx(x, g, dy, eps=1e-6):
    """Closed-form LN dx with stats recomputed (the remat situation)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    mu2 = (xf * xf).mean(-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    rstd = lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    dyg = dy.astype(jnp.float32) * g
    c1 = dyg.mean(-1, keepdims=True)
    c2 = (dyg * xhat).mean(-1, keepdims=True)
    return (rstd * (dyg - c1 - xhat * c2)).astype(x.dtype)


def timed(fn, args, k, label):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dur = time.perf_counter() - t0
    return {"label": label, "total_s": round(dur, 3),
            "ms_per_iter": round(1000 * dur / k, 4), "checksum": s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n", type=int, default=197)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--k", type=int, default=200)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the tunneled TPU (default: CPU pin)")
    args = ap.parse_args()
    B, N, D, K = args.batch, args.n, args.d, args.k

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((D,)), jnp.float32)

    def loss(x):
        return jnp.sum(ln_fwd_f32(x, g, b) * dy.astype(jnp.float32))

    @jax.jit
    def auto_k(x):
        def body(c, _):
            dx = jax.grad(loss)(c)
            # chain through a cheap dependency so the scan can't collapse
            return c + dx * jnp.bfloat16(1e-6), None
        y, _ = lax.scan(body, x, None, length=K)
        return y

    @jax.jit
    def manual_k(x):
        def body(c, _):
            dx = manual_dx(c, g, dy)
            return c + dx * jnp.bfloat16(1e-6), None
        y, _ = lax.scan(body, x, None, length=K)
        return y

    @jax.jit
    def fwd_k(x):
        def body(c, _):
            y = ln_fwd_f32(c, g, b)
            return c + y.astype(jnp.bfloat16) * jnp.bfloat16(1e-6), None
        y, _ = lax.scan(body, x, None, length=K)
        return y

    @jax.jit
    def elementwise_k(x):
        # HBM-bandwidth floor reference: one read + one write per iter,
        # no reductions. If LN dx ~= this, it is already at the machine
        # floor and a custom kernel cannot win.
        def body(c, _):
            return c * jnp.bfloat16(1.0001) + jnp.bfloat16(1e-7), None
        y, _ = lax.scan(body, x, None, length=K)
        return y

    res = [
        timed(elementwise_k, (x,), K, "elementwise_floor"),
        timed(fwd_k, (x,), K, "ln_forward_only"),
        timed(fwd_k, (x,), K, "ln_forward_only_repeat"),
        timed(auto_k, (x,), K, "autodiff_dx"),
        timed(manual_k, (x,), K, "manual_dx"),
    ]
    # correctness: one-shot dx equality
    dx_a = jax.grad(loss)(x)
    dx_m = manual_dx(x, g, dy)
    err = float(jnp.max(jnp.abs(dx_a.astype(jnp.float32)
                                - dx_m.astype(jnp.float32))))
    print(json.dumps({
        "shape": [B, N, D], "iters": K, "device": str(jax.devices()[0]),
        "results": res, "max_abs_dx_diff": err,
    }))


if __name__ == "__main__":
    main()
