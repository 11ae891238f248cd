"""Per-tower extraction timing on the current device (chained-carry timing;
`jax.block_until_ready` is a no-op through the axon tunnel).

    python tools/profile_towers.py [--batch 256] [--steps 12]

Prints one JSON line: ms per tower forward at the given batch.
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


def time_fn(fn, *args, steps=12):
    carry = jnp.float32(0)
    out = fn(*args, carry)
    float(out)  # compile + warm
    out = fn(*args, out)
    float(out)
    t0 = time.perf_counter()
    carry = jnp.float32(0)
    for _ in range(steps):
        carry = fn(*args, carry)
    float(carry)
    return (time.perf_counter() - t0) / steps * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=12)
    args = ap.parse_args()
    B = args.batch

    from bench import _init_flagship
    from bioscan_clip_tpu.data.transforms import eval_transform

    model, params = _init_flagship()
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)

    rng = np.random.default_rng(0)
    image_u8 = jnp.asarray(
        rng.integers(0, 256, size=(B, 256, 384, 3)), jnp.uint8
    )
    image = jax.jit(eval_transform)(image_u8)
    dna = jnp.asarray(rng.integers(0, 1027, size=(B, 133)), jnp.int32)
    language = {
        "input_ids": jnp.asarray(
            rng.integers(0, 30522, size=(B, 20)), jnp.int32
        ),
        "token_type_ids": jnp.zeros((B, 20), jnp.int32),
        "attention_mask": jnp.ones((B, 20), jnp.int32),
    }

    @jax.jit
    def f_img(p, x, c):
        e = model.apply({"params": p}, x + c * 0, deterministic=True,
                        method=model.encode_image)
        return jnp.mean(e) * 1e-9 + c * 1e-9

    @jax.jit
    def f_aug(p, x, c):
        img = eval_transform(x) + c
        return jnp.mean(img) * 1e-9

    @jax.jit
    def f_dna(p, x, c):
        e = model.apply({"params": p}, x + (c * 0).astype(x.dtype),
                        deterministic=True, method=model.encode_dna)
        return jnp.mean(e) * 1e-9 + c * 1e-9

    @jax.jit
    def f_txt(p, x, c):
        x = dict(x)
        x["input_ids"] = x["input_ids"] + (c * 0).astype(jnp.int32)
        e = model.apply({"params": p}, x, deterministic=True,
                        method=model.encode_language)
        return jnp.mean(e) * 1e-9 + c * 1e-9

    res = {
        "batch": B,
        "eval_transform_ms": round(time_fn(f_aug, params, image_u8,
                                           steps=args.steps), 2),
        "vit_ms": round(time_fn(f_img, params, image, steps=args.steps), 2),
        "barcode_bert_ms": round(time_fn(f_dna, params, dna,
                                         steps=args.steps), 2),
        "bert_small_ms": round(time_fn(f_txt, params, language,
                                       steps=args.steps), 2),
        "device": str(dev),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
