"""On-chip smoke for the Pallas MHA backward: Mosaic-compiles the bwd
kernel at flagship shapes, checks grads vs the XLA-math backward, and
times both.

    python tools/smoke_mha_bwd_tpu.py [--batch 32] [--n 197]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n", type=int, default=197)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--hd", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    from bioscan_clip_tpu.ops import attention as A

    b, n, heads, hd = args.batch, args.n, args.heads, args.hd
    d = heads * hd
    rng = np.random.default_rng(0)
    q, k, v, g = (
        jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)
        for _ in range(4)
    )
    seed = jnp.uint32(123)

    def make_loss(tag):
        # tag forces a separate jit cache entry per env setting
        def loss(q, k, v):
            o = A.mha(q, k, v, heads=heads, dropout_rate=0.1,
                      dropout_seed=seed)
            return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32)
                           ) + 0.0 * tag

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    out = {"batch": b, "n": n}
    grads = {}
    times = {}
    for name, env in (("pallas", "1"), ("math", "0")):
        os.environ["BSCAN_PALLAS_MHA_BWD"] = env
        f = make_loss(0.0 if env == "1" else 1.0)
        t0 = time.perf_counter()
        gs = f(q, k, v)
        float(gs[0].sum().astype(jnp.float32))
        out[f"compile_s_{name}"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        acc = q
        for _ in range(args.steps):
            gs = f(acc, k, v)
            acc = gs[0] * 0 + q  # chain dependency
        float(acc.sum().astype(jnp.float32))
        times[name] = (time.perf_counter() - t0) / args.steps * 1000
        grads[name] = [np.asarray(x, np.float32) for x in gs]
    diffs = [
        float(np.max(np.abs(a - b_)))
        for a, b_ in zip(grads["pallas"], grads["math"])
    ]
    out["max_abs_diff_dq_dk_dv"] = [round(x, 6) for x in diffs]
    out["ms_pallas"] = round(times["pallas"], 2)
    out["ms_math"] = round(times["math"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
