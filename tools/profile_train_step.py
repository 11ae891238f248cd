"""Profile the full LoRA contrastive train step on the current device.

One variant per process (each compile through the axon tunnel is slow and a
pathological variant must not block the others):

    python tools/profile_train_step.py --variant fused --batch 48
    python tools/profile_train_step.py --variant flat  --batch 48
    python tools/profile_train_step.py --variant grad  --batch 48

Variants:
  grad   value_and_grad of the contrastive loss over the trainable subset
         (no optimizer update) — the backward-health reference point.
  fused  make_train_step: grad + masked AdamW in one jit (the path
         PERF_NOTES.md round 1 measured at ~12 s/step through the tunnel).
  flat   make_flat_train_step: trainable subset packed into one flat
         vector, O(1) step outputs, fused AdamW.

Prints one JSON line with per-step ms.
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


def make_batch(B):
    rng = np.random.default_rng(0)
    return {
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--variant",
        choices=["grad", "fused", "flat", "update", "fwd"],
        default="fused",
    )
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--no-aug", action="store_true",
                    help="feed pre-transformed float images (skip the "
                         "device-side train augmentation)")
    ap.add_argument("--no-dropout", action="store_true",
                    help="deterministic towers (no dropout masks)")
    ap.add_argument("--rbg", action="store_true",
                    help="use the TPU-native RBG PRNG for all keys")
    ap.add_argument("--remat", action="store_true",
                    help="per-layer remat in the scanned towers "
                         "(ViTConfig/BertConfig.remat)")
    args = ap.parse_args()
    if args.rbg:
        jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _flagship_model
    from bioscan_clip_tpu.parallel.mesh import create_mesh, shard_batch
    from bioscan_clip_tpu.train.loop import device_batch

    model = _flagship_model(dtype=jnp.bfloat16, remat=args.remat)
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
    batch = shard_batch(device_batch(make_batch(args.batch)), mesh)
    rng = jax.random.PRNGKey(7)

    if args.no_aug:
        from bioscan_clip_tpu.data.transforms import train_transform

        img = jax.jit(train_transform)(
            batch["image_u8"], jax.random.PRNGKey(3)
        )
        batch = dict(batch, image=img)
        del batch["image_u8"]

    if args.variant in ("grad", "fwd", "update"):
        from bioscan_clip_tpu.data.transforms import train_transform
        from bioscan_clip_tpu.losses.contrastive import (
            multimodal_contrastive_loss,
        )
        from bioscan_clip_tpu.train.state import (
            merge_partitions,
            param_labels,
            partition_params,
        )

        labels = param_labels(params)
        trainable, frozen = partition_params(params, labels)
        det = bool(args.no_dropout)

        def loss_for(tr, batch, a, ri, rd, rt):
            p = merge_partitions(tr, frozen)
            rngs = (lambda r: None if det else {"dropout": r})
            img = batch.get("image")
            if img is None:
                img = train_transform(batch["image_u8"], a)
            ei = model.apply({"params": p}, img, deterministic=det,
                             rngs=rngs(ri), method=model.encode_image)
            ed = model.apply({"params": p}, batch["dna"],
                             deterministic=det, rngs=rngs(rd),
                             method=model.encode_dna)
            et = model.apply({"params": p}, batch["language"],
                             deterministic=det, rngs=rngs(rt),
                             method=model.encode_language)
            return multimodal_contrastive_loss(
                {"image": ei, "dna": ed, "language": et},
                batch["labels"], 1.0 / 0.07,
            )

        if args.variant == "update":
            # optimizer-only: masked AdamW over a fixed gradient tree
            import optax

            from bioscan_clip_tpu.train.state import create_train_state

            state = create_train_state(model, params, lambda s: 1e-3)
            fixed_g = jax.tree.map(jnp.ones_like, state.params)

            @jax.jit
            def step(state, carry):
                s2 = state.apply_gradients(
                    jax.tree.map(lambda g: g * (1.0 + carry * 1e-9), fixed_g)
                )
                return s2, carry + 1.0

            carry = jnp.float32(0)
            t0 = time.perf_counter()
            state, carry = step(state, carry)
            float(carry)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, carry = step(state, carry)
            float(carry)
            dur = time.perf_counter() - t0
        else:
            @jax.jit
            def step(trainable, batch, r, carry):
                a, ri, rd, rt = jax.random.split(
                    jax.random.fold_in(r, carry[0]), 4
                )
                if args.variant == "fwd":
                    loss = loss_for(trainable, batch, a, ri, rd, rt)
                else:
                    loss, g = jax.value_and_grad(loss_for)(
                        trainable, batch, a, ri, rd, rt
                    )
                    # keep the backward alive against DCE
                    gsum = jax.tree.reduce(
                        lambda acc, x: acc + jnp.sum(x).astype(jnp.float32),
                        g, jnp.float32(0),
                    )
                    loss = loss + gsum * 1e-30
                return (carry[0] + 1, carry[1] + loss)

            carry = (jnp.int32(0), jnp.float32(0))
            t0 = time.perf_counter()
            carry = step(trainable, batch, rng, carry)
            float(carry[1])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.steps):
                carry = step(trainable, batch, rng, carry)
            float(carry[1])
            dur = time.perf_counter() - t0
    else:
        if args.variant == "fused":
            from bioscan_clip_tpu.train.loop import make_train_step
            from bioscan_clip_tpu.train.state import create_train_state

            state = create_train_state(model, params, lambda s: 1e-3)
            step = make_train_step(model, mesh)
        else:
            from bioscan_clip_tpu.train.flat_state import (
                create_flat_train_state,
                make_flat_train_step,
            )

            state = create_flat_train_state(params, lambda s: 1e-3)
            step = make_flat_train_step(model, mesh)

        t0 = time.perf_counter()
        state, loss = step(state, batch, rng)
        float(loss)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, loss = step(state, batch, rng)
        float(loss)
        dur = time.perf_counter() - t0

    print(json.dumps({
        "variant": args.variant,
        "batch": args.batch,
        "step_ms": round(1000 * dur / args.steps, 1),
        "samples_per_s": round(args.batch * args.steps / dur, 1),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
