"""Benchmark: tri-modal embedding extraction throughput on one TPU chip.

Measures the flagship inference path (the hot loop of extract_embedding /
inference_and_eval): deterministic eval transform + ViT-B/16 + BarcodeBERT +
BERT-small forward, bf16 compute, L2-normalized 768-d embeddings, batch 256.

`python bench.py --train [--batch B]` instead measures the full LoRA
contrastive TRAIN step (device-side augmentation + 3 towers + global-batch
InfoNCE + AdamW) in samples/s — the second half of the BASELINE.md:61 target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

vs_baseline: BASELINE.json's north star is >=3x A100 per-chip throughput.
The reference publishes no throughput numbers (SURVEY.md §6), so the A100
anchor is estimated from standard public measurements: ViT-B/16 fp16 eager
inference on A100 ~=900 img/s at bs256; adding BarcodeBERT (133 tok,
BERT-base geometry) and BERT-small (20 tok) roughly halves it ->
~450 tri-modal samples/s/A100. Target = 3x = 1350;
vs_baseline = measured / 1350.
"""

import json
import os
import sys
import time

import jax

try:  # persistent XLA compilation cache (tunnel compiles are 20s-30min)
    from bioscan_clip_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

A100_TRIMODAL_EST = 450.0  # samples/s, documented estimate (see docstring)
TARGET = 3.0 * A100_TRIMODAL_EST

# A100 train-step anchor: the reference trains LoRA bs400 on one A100; public
# ViT-B/16 fp16 train throughput on A100 is ~330 img/s full fine-tune; the
# tri-modal LoRA contrastive step (3 towers forward + LoRA backward ~ 2.2x
# forward cost) lands ~150 samples/s/A100. Target = 3x = 450.
A100_TRAIN_EST = 150.0
TRAIN_TARGET = 3.0 * A100_TRAIN_EST

# extraction batch ladder (BENCH_EXTRACT_sweep_r03.jsonl, merged LoRA):
# 256 -> 1671.6/s, 384 -> 1690.5/s, 512 -> 1664.4/s; 384 is the knee
BATCH = 384
STEPS = 20


def _init_flagship(dtype=jnp.bfloat16, remat=False, no_dropout=False,
                   remat_policy="full"):
    from __graft_entry__ import _flagship_model

    model = _flagship_model(dtype=dtype, remat=remat, no_dropout=no_dropout,
                            remat_policy=remat_policy)
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
            deterministic=True,
        )["params"]
    return model, params


def main_train(batch: int, steps: int = 8, variant: str = "flat",
               remat: bool = False, no_dropout: bool = False,
               pre_aug: bool = False, scan: int = 0,
               host_crop: bool = False, remat_policy: str = "full"):
    """Full LoRA contrastive train-step throughput (one chip).

    `scan=K` runs K full steps per dispatch (make_scan_train_step) —
    amortizes the seconds-scale per-dispatch overhead of the axon tunnel
    (PERF_NOTES.md round 2); identical per-step semantics.

    `host_crop` feeds (224, 224, 3) uint8 (the pipeline's tpu.train_crop
    host RandomResizedCrop output) — ~2x fewer stacked-batch bytes, so K
    roughly doubles before the HBM ceiling."""
    from bioscan_clip_tpu.parallel.mesh import create_mesh, shard_batch
    from bioscan_clip_tpu.train.loop import device_batch

    model, params = _init_flagship(remat=remat, no_dropout=no_dropout,
                                   remat_policy=remat_policy)
    if "--frozen-bf16" in sys.argv:
        # bit-identical under bf16 compute; halves the frozen-tree footprint
        # and weight HBM reads (train/state.py cast_frozen_params)
        from bioscan_clip_tpu.train.state import cast_frozen_params

        params = cast_frozen_params(params)
    mesh = create_mesh()
    rng = np.random.default_rng(0)
    img_hw = (224, 224) if host_crop else (256, 384)
    b = {
        "image_u8": jnp.asarray(
            rng.integers(0, 256, size=(batch,) + img_hw + (3,)), jnp.uint8
        ),
        "dna": jnp.asarray(rng.integers(0, 1027, size=(batch, 133)), jnp.int32),
        "language": {
            "input_ids": jnp.asarray(
                rng.integers(0, 30522, size=(batch, 20)), jnp.int32
            ),
            "token_type_ids": jnp.zeros((batch, 20), jnp.int32),
            "attention_mask": jnp.ones((batch, 20), jnp.int32),
        },
        "labels": jnp.arange(batch, dtype=jnp.int32),
    }
    if pre_aug:
        # perf-bisect knob: run the train augmentation ONCE outside the
        # step and feed float images (isolates in-step aug cost)
        from bioscan_clip_tpu.data.transforms import train_transform

        b["image"] = jax.jit(train_transform)(
            b.pop("image_u8"), jax.random.PRNGKey(3)
        )
    sharded = shard_batch(device_batch(b), mesh)

    if scan > 0:
        from bioscan_clip_tpu.parallel.mesh import shard_stacked_batches
        from bioscan_clip_tpu.train.loop import (
            make_scan_train_step,
            make_train_step,
        )
        from bioscan_clip_tpu.train.state import create_train_state

        same_batch = "--same-batch" in sys.argv
        flat_scan = "--flat-scan" in sys.argv
        gradcache = _flag_value("--gradcache", 0)
        if gradcache:
            # The flagship single-chip recipe: global batch `batch` as
            # `gradcache` microbatches with FULL-batch InfoNCE negatives
            # (make_gradcache_train_step), K macro-steps per dispatch.
            # E.g. the reference's batch-400 config on one 16 GB chip:
            #   bench.py --train --batch 400 --gradcache 8 --scan 8 ...
            from bioscan_clip_tpu.train.loop import make_gradcache_train_step
            from bioscan_clip_tpu.train.state import create_train_state

            state = create_train_state(model, params, lambda s: 1e-3)
            # merged stage-1 (tpu.gradcache_merged, the train_cl default):
            # the no-grad embedding pass runs rank-0 with adapters folded
            # into the projection kernels; --no-gc-merged A/Bs it off
            merged_model = None
            if "--no-gc-merged" not in sys.argv:
                from __graft_entry__ import _flagship_model

                merged_model = _flagship_model(
                    remat=remat, no_dropout=no_dropout,
                    remat_policy=remat_policy, lora_rank=0,
                )
            kstep = make_gradcache_train_step(
                model, mesh, accum_steps=gradcache, steps_per_call=scan,
                same_batch=same_batch, merged_model=merged_model,
                s1_image_batch=_flag_value("--s1-image-batch", 0),
                cache_aug="--cache-aug" in sys.argv,
                # --s1-chunk N: stage 1 embeds ALL towers in chunks of N
                # (row-keyed dropout; train/loop.py docstring)
                s1_chunk=_flag_value("--s1-chunk", 0),
            )
        elif flat_scan:
            # tiny donated carry (flat LoRA vector + AdamW state); the
            # frozen tree is a cached standing arg — through the tunnel
            # this removes the ~19 s/call donated-state round trip
            from bioscan_clip_tpu.train.flat_state import (
                create_flat_train_state,
                make_flat_scan_train_step,
            )

            state = create_flat_train_state(params, lambda s: 1e-3)
            kstep = make_flat_scan_train_step(
                model, mesh, steps_per_call=scan, same_batch=same_batch
            )
        else:
            state = create_train_state(model, params, lambda s: 1e-3)
            kstep = make_scan_train_step(
                model, mesh, steps_per_call=scan, same_batch=same_batch
            )
        if same_batch:
            # One resident B-sized batch scanned K times (xs=None closure):
            # identical per-step compute/optimizer work, but the K-scaled
            # (K, B, ...) input stack — and with it the HBM ceiling on K and
            # the tunnel's footprint-scaled per-dispatch overhead — is gone.
            # Measures the train step proper; the stacked variant measures
            # step + input feed.
            stacked = sharded
        else:
            stacked = shard_stacked_batches(
                jax.tree.map(
                    lambda x: jnp.broadcast_to(x[None], (scan,) + x.shape),
                    device_batch(b),
                ),
                mesh,
            )
        # --rbg: typed key with the TPU-native RBG PRNG — every split/
        # fold_in downstream (aug + dropout) inherits the impl
        key = (
            jax.random.key(7, impl="rbg")
            if "--rbg" in sys.argv
            else jax.random.PRNGKey(7)
        )
        t0 = time.perf_counter()
        state, losses = kstep(state, stacked, key)
        float(losses[-1])
        compile_s = time.perf_counter() - t0
        # The tunnel adds a nondeterministic per-dispatch overhead D
        # (measured 6-20 s for the same program, PERF_NOTES.md); like the
        # extraction bench's best-of-chunks, time each K-step dispatch
        # separately (losses fetch syncs it) and report the best. Each
        # dispatch stays under the worker's ~68 s execution watchdog.
        n_calls = _flag_value("--dispatches", max(1, steps // scan))
        per_call = []
        enqueue_per = []
        for _ in range(n_calls):
            t0 = time.perf_counter()
            state, losses = kstep(state, stacked, key)
            enqueue_per.append(time.perf_counter() - t0)
            float(losses[-1])
            per_call.append(time.perf_counter() - t0)
        best = per_call.index(min(per_call))
        dur = per_call[best]
        enqueue_s = enqueue_per[best]
        n_steps = scan
        samples_per_s = batch * n_steps / dur
        print(json.dumps({
            "metric": "trimodal_train_samples_per_sec_per_chip",
            "value": round(samples_per_s, 1),
            "unit": "samples/s",
            "vs_baseline": round(samples_per_s / TRAIN_TARGET, 3),
            "vs_a100_estimate": round(samples_per_s / A100_TRAIN_EST, 2),
            "batch": batch,
            "variant": "gradcache" if gradcache else "scan",
            "accum_steps": gradcache,
            "remat": remat,
            "remat_policy": remat_policy,
            "host_crop": host_crop,
            "frozen_bf16": "--frozen-bf16" in sys.argv,
            "rbg": "--rbg" in sys.argv,
            "fast_ln": os.environ.get("BSCAN_FAST_LN", "0") == "1",
            "no_dropout": no_dropout,
            "same_batch": same_batch,
            "flat_scan": flat_scan,
            "steps_per_call": scan,
            "step_ms": round(1000 * dur / n_steps, 2),
            "enqueue_ms_per_step": round(1000 * enqueue_s / n_steps, 2),
            "dispatch_s": [round(t, 2) for t in per_call],
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
            "baseline_note": (
                f"target={TRAIN_TARGET:.0f}/s (3x est. A100 tri-modal LoRA "
                "contrastive train step)"
            ),
        }))
        return

    if variant == "flat":
        from bioscan_clip_tpu.train.flat_state import (
            create_flat_train_state,
            make_flat_train_step,
        )

        state = create_flat_train_state(params, lambda s: 1e-3)
        # remat happens per-layer inside the towers (_init_flagship(remat=));
        # the step-level whole-tower jax.checkpoint stays off
        step = make_flat_train_step(
            model, mesh, donate="--no-donate" not in sys.argv
        )
    else:
        from bioscan_clip_tpu.train.loop import make_train_step
        from bioscan_clip_tpu.train.state import create_train_state

        state = create_train_state(model, params, lambda s: 1e-3)
        step = make_train_step(model, mesh)

    # --rbg: typed key with the TPU-native RBG PRNG — every split/fold_in
    # downstream (aug + dropout) inherits the impl, replacing threefry
    key = (
        jax.random.key(7, impl="rbg")
        if "--rbg" in sys.argv
        else jax.random.PRNGKey(7)
    )
    t0 = time.perf_counter()
    state, loss = step(state, sharded, key)
    float(loss)
    compile_s = time.perf_counter() - t0
    state, loss = step(state, sharded, key)
    float(loss)

    # steps chain through the donated state; one final loss fetch syncs all.
    # enqueue/sync split: slow enqueue = host/dispatch-side cost, slow sync
    # = device/tunnel execution cost.
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, sharded, key)
    enqueue_s = time.perf_counter() - t0
    float(loss)
    dur = time.perf_counter() - t0

    samples_per_s = batch * steps / dur
    print(json.dumps({
        "metric": "trimodal_train_samples_per_sec_per_chip",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / TRAIN_TARGET, 3),
        "vs_a100_estimate": round(samples_per_s / A100_TRAIN_EST, 2),
        "batch": batch,
        "variant": variant,
        "remat": remat,
        "no_dropout": no_dropout,
        "pre_aug": pre_aug,
        "rbg": "--rbg" in sys.argv,
        "enqueue_ms_per_step": round(1000 * enqueue_s / steps, 2),
        "step_ms": round(1000 * dur / steps, 2),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
        "baseline_note": (
            f"target={TRAIN_TARGET:.0f}/s (3x est. A100 tri-modal LoRA "
            "contrastive train step)"
        ),
    }))


def main(batch: int = BATCH, scan: int = 0, dispatches: int = 4):
    from bioscan_clip_tpu.data.transforms import eval_transform

    BATCH = batch  # noqa: N806 — local override of the module default
    dev = jax.devices()[0]
    model, params = _init_flagship()
    lora_merged = "--no-merge-lora" not in sys.argv
    if lora_merged:
        # Measure the merged deployment form (the extract/eval/serve CLIs'
        # `tpu.merge_lora` path): adapters folded into the projection
        # kernels, towers rebuilt rank-0 — zero adapter ops per layer.
        from __graft_entry__ import _flagship_model
        from bioscan_clip_tpu.models.lora import merge_lora_params

        params = merge_lora_params(params)
        model = _flagship_model(lora_rank=0)
    if "--frozen-bf16" in sys.argv:
        from bioscan_clip_tpu.train.state import cast_frozen_params

        params = cast_frozen_params(params)
    params = jax.device_put(params, dev)

    rng = np.random.default_rng(0)
    image_u8 = jnp.asarray(
        rng.integers(0, 256, size=(BATCH, 256, 384, 3)), jnp.uint8
    )
    dna = jnp.asarray(rng.integers(0, 1027, size=(BATCH, 133)), jnp.int32)
    language = {
        "input_ids": jnp.asarray(
            rng.integers(0, 30522, size=(BATCH, 20)), jnp.int32
        ),
        "token_type_ids": jnp.zeros((BATCH, 20), jnp.int32),
        "attention_mask": jnp.ones((BATCH, 20), jnp.int32),
    }

    if scan > 0:
        # K full extraction steps per dispatch (lax.scan over a resident
        # batch) — same dispatch-amortization methodology as the train
        # bench (`--train --scan K --same-batch`): identical per-step
        # compute, but the tunnel's per-dispatch overhead is paid once per
        # K steps instead of once per step. The carry threads through every
        # tower's output so no step (and no tower) can be dead-code
        # eliminated, and steps stay strictly sequential.
        @jax.jit
        def embed_scan(params, image_u8, dna, language, carry):
            def body(c, _):
                # XOR a carry-derived bit into the uint8 input so the
                # transform's *input* depends on the loop carry — without
                # this only the `+ c` is carry-dependent and XLA's
                # while-loop LICM could hoist the crop+cast out of the
                # body, under-counting per-step work (advisor r3).
                jitter = (c * 1e9).astype(jnp.int32).astype(jnp.uint8) & \
                    jnp.uint8(1)
                img = eval_transform(image_u8 ^ jitter) + c
                i_e, d_e, t_e = model.apply(
                    {"params": params}, img, dna, language,
                    deterministic=True,
                )
                c = (
                    jnp.mean(i_e) + jnp.mean(d_e) + jnp.mean(t_e)
                ).astype(jnp.float32) * 1e-9
                return c, None

            c, _ = jax.lax.scan(body, carry, None, length=scan)
            return c

        t0 = time.perf_counter()
        c = embed_scan(params, image_u8, dna, language, jnp.float32(0))
        float(c)
        compile_s = time.perf_counter() - t0
        per_dispatch = []
        for _ in range(dispatches):
            t0 = time.perf_counter()
            c = embed_scan(params, image_u8, dna, language, c)
            float(c)
            per_dispatch.append(round(time.perf_counter() - t0, 3))
        dur = min(per_dispatch)
        samples_per_s = BATCH * scan / dur
        result = {
            "metric": "trimodal_embeddings_per_sec_per_chip",
            "value": round(samples_per_s, 1),
            "unit": "samples/s",
            "vs_baseline": round(samples_per_s / TARGET, 3),
            "vs_a100_estimate": round(samples_per_s / A100_TRIMODAL_EST, 2),
            "batch": BATCH,
            "lora_merged": lora_merged,
            "steps_per_dispatch": scan,
            "step_ms": round(1000 * dur / scan, 2),
            "dispatch_s": per_dispatch,
            "compile_s": round(compile_s, 1),
            "device": str(dev),
            "baseline_note": (
                f"target={TARGET:.0f}/s (3x est. A100 tri-modal); this chip "
                "is a v5e (197 bf16 TFLOPs vs A100's 312 fp16)"
            ),
        }
        print(json.dumps(result))
        return

    @jax.jit
    def embed_step(params, image_u8, dna, language, carry):
        # `carry` forces sequential dependency between timed steps — the
        # axon-tunneled backend's block_until_ready is asynchronous, so
        # honest timing requires a host fetch of a value that depends on
        # every step in the chain.
        img = eval_transform(image_u8) + carry
        i_e, d_e, t_e = model.apply(
            {"params": params}, img, dna, language, deterministic=True
        )
        return i_e, d_e, t_e, jnp.mean(i_e) * 1e-9

    # compile + warmup (host fetch forces execution)
    t0 = time.perf_counter()
    out = embed_step(params, image_u8, dna, language, jnp.float32(0))
    float(out[3])
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        out = embed_step(params, image_u8, dna, language, jnp.float32(0))
    float(out[3])

    # The tunneled device exhibits high wall-clock variance; time several
    # chained chunks and report the best (closest to true device throughput).
    per_chunk = []
    for _ in range(4):
        t0 = time.perf_counter()
        carry = jnp.float32(0)
        for _ in range(STEPS // 4):
            *_, carry = embed_step(params, image_u8, dna, language, carry)
        float(carry)  # force the whole chain
        per_chunk.append(time.perf_counter() - t0)
    dur = min(per_chunk) * 4

    samples_per_s = BATCH * STEPS / dur
    result = {
        "metric": "trimodal_embeddings_per_sec_per_chip",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / TARGET, 3),
        "vs_a100_estimate": round(samples_per_s / A100_TRIMODAL_EST, 2),
        "batch": BATCH,
        "lora_merged": lora_merged,
        "step_ms": round(1000 * dur / STEPS, 2),
        "compile_s": round(compile_s, 1),
        "device": str(dev),
        "baseline_note": (
            f"target={TARGET:.0f}/s (3x est. A100 tri-modal); this chip is a "
            "v5e (197 bf16 TFLOPs vs A100's 312 fp16)"
        ),
    }
    print(json.dumps(result))


def _flag_value(name: str, default, cast=int):
    """`--name V` lookup with a clear error instead of IndexError /
    bare ValueError when V is missing or non-castable (advisor r3)."""
    if name not in sys.argv:
        return default
    i = sys.argv.index(name)
    if i + 1 >= len(sys.argv):
        sys.exit(f"bench.py: {name} requires a value")
    try:
        return cast(sys.argv[i + 1])
    except ValueError:
        sys.exit(f"bench.py: {name} expects {cast.__name__}, "
                 f"got {sys.argv[i + 1]!r}")


if __name__ == "__main__":
    if "--champion" in sys.argv:
        # The measured-best train config (BENCH_TRAIN_sweep_r03.jsonl,
        # queue-w): B=24, K=1024 steps/dispatch, dots remat, rbg PRNG,
        # host crop, bf16 frozen-weight storage, resident same_batch scan
        # -> 604.6 samples/s (39.69 ms/step = 1.65 ms/sample). Equivalent:
        #   bench.py --train --host-crop --batch 24 --scan 1024 \
        #            --remat-policy dots --rbg --same-batch --frozen-bf16
        sys.argv += ["--train", "--host-crop", "--rbg", "--same-batch"]
        if "--no-frozen-bf16" not in sys.argv:
            # bit-identical under bf16 compute; measured A/B win and
            # halves the donated-state footprint
            sys.argv += ["--frozen-bf16"]
        if "--dispatches" not in sys.argv:
            # 3 timed dispatches, best-of (the tunnel's per-dispatch
            # overhead D varies 6-20 s run to run)
            sys.argv += ["--dispatches", "3"]
        main_train(24, scan=1024, remat=True, remat_policy="dots",
                   host_crop=True)
        sys.exit(0)
    if "--train" in sys.argv:
        bi = _flag_value("--batch", 128)
        variant = "fused" if "--fused-state" in sys.argv else "flat"
        scan_k = _flag_value("--scan", 0)
        rp = _flag_value("--remat-policy", "full", cast=str)
        main_train(bi, variant=variant,
                   remat="--remat" in sys.argv or rp != "full",
                   no_dropout="--no-dropout" in sys.argv,
                   pre_aug="--pre-aug" in sys.argv, scan=scan_k,
                   host_crop="--host-crop" in sys.argv, remat_policy=rp)
    else:
        main(
            _flag_value("--batch", BATCH),
            # Default: 96 extraction steps per dispatch (lax.scan) — the
            # measured on-chip rate (2975.5/s at B=384 vs 1691.3/s in
            # per-step mode, whose 227 ms wall "step" carried ~98 ms of
            # tunnel dispatch overhead). `--scan 0` forces per-step mode.
            scan=_flag_value("--scan", 96),
            # 3 matches the recorded sweep rows / docs/BENCHMARKS.md
            # reproduce commands (advisor r3).
            dispatches=_flag_value("--dispatches", 3),
        )
