"""Tiny-model full train step on the current device: same STRUCTURE as the
flagship step (3 scanned towers + LoRA + aug + dropout + InfoNCE + AdamW),
~100x smaller tensors. Separates structure-proportional overhead (scan
iterations, dispatch) from size-proportional overhead (HLO temp, transfers)
in the fixed ~20 s/step flagship pathology (PERF_NOTES.md round 2).

    python tools/probe_tiny_train.py [--batch 64] [--layers 2] [--hidden 64]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    from bioscan_clip_tpu.models.bert import (
        BarcodeBertDnaEncoder,
        BertConfig,
        BertTextEncoder,
    )
    from bioscan_clip_tpu.models.clip import MultiModalCLIP
    from bioscan_clip_tpu.models.vit import ViT, ViTConfig
    from bioscan_clip_tpu.parallel.mesh import create_mesh, shard_batch
    from bioscan_clip_tpu.train.loop import device_batch, make_train_step
    from bioscan_clip_tpu.train.state import create_train_state

    h = args.hidden
    kw = dict(
        hidden_size=h, num_layers=args.layers, num_heads=4,
        intermediate_size=2 * h, lora_rank=4, remat=args.remat,
    )
    model = MultiModalCLIP(
        image_encoder=ViT(
            ViTConfig(image_size=224, patch_size=32, hidden_size=h,
                      num_layers=args.layers, num_heads=4, num_classes=h,
                      lora_rank=4, remat=args.remat),
            dtype=jnp.bfloat16,
        ),
        dna_encoder=BarcodeBertDnaEncoder(
            BertConfig(vocab_size=1027, **kw), output_dim=h,
            dtype=jnp.bfloat16,
        ),
        language_encoder=BertTextEncoder(
            BertConfig(vocab_size=30522, **kw), output_dim=h,
            dtype=jnp.bfloat16,
        ),
    )

    B = args.batch
    rng = np.random.default_rng(0)
    batch = {
        "image_u8": jnp.asarray(
            rng.integers(0, 256, size=(B, 256, 384, 3)), jnp.uint8
        ),
        "dna": jnp.asarray(rng.integers(0, 1027, size=(B, 133)), jnp.int32),
        "language": {
            "input_ids": jnp.asarray(
                rng.integers(0, 30522, size=(B, 20)), jnp.int32
            ),
            "token_type_ids": jnp.zeros((B, 20), jnp.int32),
            "attention_mask": jnp.ones((B, 20), jnp.int32),
        },
        "labels": jnp.arange(B, dtype=jnp.int32),
    }
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 224, 224, 3)),
            jnp.zeros((2, 133), jnp.int32),
            {
                "input_ids": jnp.zeros((2, 20), jnp.int32),
                "token_type_ids": jnp.zeros((2, 20), jnp.int32),
                "attention_mask": jnp.ones((2, 20), jnp.int32),
            },
        )["params"]
    mesh = create_mesh()
    state = create_train_state(model, params, lambda s: 1e-3)
    step = make_train_step(model, mesh)
    sharded = shard_batch(device_batch(batch), mesh)
    key = jax.random.PRNGKey(7)

    t0 = time.perf_counter()
    state, loss = step(state, sharded, key)
    float(loss)
    compile_s = time.perf_counter() - t0
    state, loss = step(state, sharded, key)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, loss = step(state, sharded, key)
    enqueue_s = time.perf_counter() - t0
    float(loss)
    dur = time.perf_counter() - t0
    print(json.dumps({
        "probe": "tiny-train",
        "batch": B, "layers": args.layers, "hidden": args.hidden,
        "remat": args.remat,
        "step_ms": round(1000 * dur / args.steps, 1),
        "enqueue_ms_per_step": round(1000 * enqueue_s / args.steps, 2),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
