"""Micro-probes isolating the fixed ~20 s/step train pathology.

Each probe is a tiny program (fast compile) exercising ONE suspect:

  big-donate   chained donated elementwise update of a 920 MB buffer
               (tunnel round-trip / donation overhead)
  flat-grad    value_and_grad THROUGH unflatten (dynamic-slice) of a flat
               vector into ~700 leaves -> backward scatters per leaf
               (the flat_state.py formulation)
  tree-grad    same leaves as separate arguments (no slicing in the
               differentiated path) + forward-only flatten of the grads
               (the proposed fix)

    python tools/probe_tunnel.py --probe flat-grad [--leaves 700]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(step, init, steps=8):
    t0 = time.perf_counter()
    carry = step(init)
    jax.tree.map(lambda x: x.block_until_ready(), carry)
    float(jax.tree.leaves(carry)[0].ravel()[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(steps):
        carry = step(carry)
    float(jax.tree.leaves(carry)[0].ravel()[0])
    return compile_s, (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", choices=["big-donate", "flat-grad",
                                        "tree-grad"], required=True)
    ap.add_argument("--leaves", type=int, default=700)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    if args.probe == "big-donate":
        x = jnp.zeros((230_000_000,), jnp.float32)  # 920 MB

        @jax.jit
        def step(x):
            return x + 1.0

        step = jax.jit(lambda x: x + 1.0, donate_argnums=(0,))
        compile_s, per_step = chain_time(step, x, args.steps)

    else:
        rng = np.random.default_rng(0)
        n_leaves = args.leaves
        # leaf sizes like LoRA training: mostly tiny, a few ~600k
        sizes = [3072] * (n_leaves - 6) + [590_000] * 6
        consts = [jnp.asarray(rng.standard_normal(s), jnp.float32)
                  for s in sizes]
        offsets = np.concatenate([[0], np.cumsum(sizes)]).tolist()
        total = offsets[-1]
        flat0 = jnp.zeros((total,), jnp.float32)

        if args.probe == "flat-grad":
            def loss_f(flat):
                acc = jnp.float32(0)
                for c, off, size in zip(consts, offsets, sizes):
                    leaf = jax.lax.dynamic_slice(flat, (off,), (size,))
                    acc = acc + jnp.dot(leaf, c)
                return acc * 1e-6

            @jax.jit
            def step(flat):
                loss, g = jax.value_and_grad(loss_f)(flat)
                return flat - 1e-3 * g + loss * 0

            step = jax.jit(
                lambda flat: (lambda lg: flat - 1e-3 * lg[1] + lg[0] * 0)(
                    jax.value_and_grad(loss_f)(flat)
                ),
                donate_argnums=(0,),
            )
            compile_s, per_step = chain_time(step, flat0, args.steps)
        else:
            leaves0 = [jnp.zeros((s,), jnp.float32) for s in sizes]

            def loss_t(leaves):
                acc = jnp.float32(0)
                for leaf, c in zip(leaves, consts):
                    acc = acc + jnp.dot(leaf, c)
                return acc * 1e-6

            def stepf(leaves):
                loss, g = jax.value_and_grad(loss_t)(leaves)
                gflat = jnp.concatenate([x.ravel() for x in g])
                upd = -1e-3 * gflat + loss * 0
                return [
                    leaf + jax.lax.dynamic_slice(upd, (off,), (size,))
                    for leaf, off, size in zip(leaves, offsets, sizes)
                ]

            step = jax.jit(stepf, donate_argnums=(0,))
            compile_s, per_step = chain_time(step, leaves0, args.steps)

    print(json.dumps({
        "probe": args.probe,
        "compile_s": round(compile_s, 1),
        "per_step_ms": round(per_step * 1000, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
