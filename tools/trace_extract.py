"""Per-op device-time attribution for the extraction bench (bench.py main).

Captures a jax.profiler trace of the flagship tri-modal embed step (eval
transform + 3 tower forwards, bf16, batch N) and aggregates the device
plane's leaf-op durations with tools/trace_train_step.aggregate — shows
where the ~167 ms/step (B=256) goes, tower by tower / op by op.

    python tools/trace_extract.py [--batch 256] [--steps 4] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from trace_train_step import aggregate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import _init_flagship
    from bioscan_clip_tpu.data.transforms import eval_transform

    dev = jax.devices()[0]
    model, params = _init_flagship()
    params = jax.device_put(params, dev)
    rng = np.random.default_rng(0)
    B = args.batch
    image_u8 = jnp.asarray(
        rng.integers(0, 256, size=(B, 256, 384, 3)), jnp.uint8
    )
    dna = jnp.asarray(rng.integers(0, 1027, size=(B, 133)), jnp.int32)
    language = {
        "input_ids": jnp.asarray(
            rng.integers(0, 30522, size=(B, 20)), jnp.int32
        ),
        "token_type_ids": jnp.zeros((B, 20), jnp.int32),
        "attention_mask": jnp.ones((B, 20), jnp.int32),
    }

    @jax.jit
    def embed_step(params, image_u8, dna, language, carry):
        img = eval_transform(image_u8) + carry
        i_e, d_e, t_e = model.apply(
            {"params": params}, img, dna, language, deterministic=True
        )
        return i_e, d_e, t_e, jnp.mean(i_e) * 1e-9

    out = embed_step(params, image_u8, dna, language, jnp.float32(0))
    float(out[3])  # compile + warm outside the trace

    trace_dir = tempfile.mkdtemp(prefix="bscan_xtrace_")
    jax.profiler.start_trace(trace_dir)
    carry = jnp.float32(0)
    for _ in range(args.steps):
        *_, carry = embed_step(params, image_u8, dna, language, carry)
    float(carry)
    jax.profiler.stop_trace()

    agg = aggregate(trace_dir)
    res = {"batch": B, "steps": args.steps,
           "trace_dir": trace_dir if args.keep else None, "agg": agg}
    if agg:
        res["per_step_leaf_ms"] = round(agg["leaf_total_ms"] / args.steps, 2)
    print(json.dumps(res))
    if not args.keep:
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
