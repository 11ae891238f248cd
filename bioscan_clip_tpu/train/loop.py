"""The jitted global-batch contrastive train step + epoch driver.

One `jax.jit` over the mesh covers: 3 encoder forwards, the global-batch
pairwise InfoNCE (XLA all-gathers the (B, D) embeddings over ICI — the
ClipLoss semantics, loss_func.py:117-136), backward, and the masked AdamW
update. The batch is sharded over the `data` axis; params/opt state are
replicated. This is the whole of the reference's mp.spawn + NCCL + broadcast
+ all_gather machinery (train_cl.py:42-46,149; §2.8), expressed as shardings.

Per-step LR scheduling matches train_epoch.py:41-42 (scheduler.step() every
step).
"""

from __future__ import annotations

import functools
import time
import jax
import jax.numpy as jnp
import numpy as np

from bioscan_clip_tpu.losses.contrastive import multimodal_contrastive_loss
from bioscan_clip_tpu.parallel.mesh import replicated, shard_batch

LOGIT_SCALE = 1.0 / 0.07  # fixed temperature (train_cl.py:190)


DEVICE_BATCH_KEYS = ("image", "image_u8", "dna", "language", "labels")


def make_logit_scale_param(params, init: float = LOGIT_SCALE):
    """Add the OPTIONAL learnable log-temperature to a param tree (SURVEY §7
    stage 6 "fixed tau=0.07 with optional learnable scale"; CLIP-style:
    the param stores log(scale), trained without weight decay — see
    train/state.py labels). Enabled by `model_config.learnable_logit_scale`."""
    return {**params, "logit_scale": jnp.log(jnp.float32(init))}


def logit_scale_value(params, fixed):
    """exp(log-temperature) when the learnable scale param is present, else
    the fixed reference value (train_cl.py:190)."""
    ls = params.get("logit_scale") if isinstance(params, dict) else None
    return jnp.exp(ls) if ls is not None else fixed


def _tower_params(p):
    """Strip non-module params (the optional logit_scale) before
    model.apply."""
    if isinstance(p, dict) and "logit_scale" in p:
        return {k: v for k, v in p.items() if k != "logit_scale"}
    return p


def device_batch(batch: dict) -> dict:
    """Select the array-valued keys that go to device (label_dicts/ids are
    host-side metadata for eval)."""
    return {k: batch[k] for k in DEVICE_BATCH_KEYS if k in batch}


def make_train_step(
    model, mesh, logit_scale: float = LOGIT_SCALE,
    openclip_norm: bool = False, remat: bool = False,
    disable_lora: bool = False, color_jitter: bool = False,
):
    """Build the jitted train step for a MultiModalCLIP model on `mesh`.

    If the batch ships raw `image_u8` pixels, the torchvision-parity train
    augmentation (data/transforms.py) runs on device inside this same jit —
    fused with the forward, no extra HBM round trip.

    `remat=True` wraps each tower in `jax.checkpoint` (recompute activations
    in the backward, cutting peak HBM). Default off: prefer fitting memory
    via smaller per-device batches / `make_accum_train_step` — see
    PERF_NOTES.md for measurements.
    """
    from bioscan_clip_tpu.data.transforms import (
        train_transform_auto as train_transform,
    )

    wrap = jax.checkpoint if remat else (lambda f: f)
    encoders = {
        "image": (model.image_encoder, model.encode_image),
        "dna": (model.dna_encoder, model.encode_dna),
        "language": (model.language_encoder, model.encode_language),
    }
    towers = {
        name: wrap(
            functools.partial(
                lambda p, x, r, _m: model.apply(
                    {"params": _tower_params(p)}, x, deterministic=False,
                    rngs={"dropout": r}, method=_m,
                ),
                _m=method,
            )
        )
        for name, (enc, method) in encoders.items()
        if enc is not None
    }

    def loss_fn(params, batch, dropout_rng):
        aug_rng, r_img, r_dna, r_txt = jax.random.split(dropout_rng, 4)
        image = batch.get("image")
        if image is None and "image_u8" in batch:
            image = train_transform(
                batch["image_u8"], aug_rng, normalize=openclip_norm,
                jitter=color_jitter,
            )
        inputs = {
            "image": (image, r_img),
            "dna": (batch.get("dna"), r_dna),
            "language": (batch.get("language"), r_txt),
        }
        embs = {}
        for name, tower in towers.items():
            x, r = inputs[name]
            embs[name] = tower(params, x, r) if x is not None else None
        return multimodal_contrastive_loss(
            embs, batch["labels"], logit_scale_value(params, logit_scale)
        )

    from bioscan_clip_tpu.train.state import (
        grads_to_full_tree,
        merge_partitions,
        param_labels,
        partition_params,
    )

    @functools.partial(
        jax.jit,
        donate_argnums=(0,),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )
    def train_step(state, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        # differentiate only the trainable subset: frozen-weight dW matmuls
        # never appear in the backward (big win for LoRA training)
        labels = param_labels(state.params, disable_lora=disable_lora)
        trainable, frozen = partition_params(state.params, labels)

        def loss_t(tr):
            return loss_fn(merge_partitions(tr, frozen), batch, dropout_rng)

        loss, g = jax.value_and_grad(loss_t)(trainable)
        grads = grads_to_full_tree(g, state.params)
        return state.apply_gradients(grads), loss

    return train_step


def make_scan_train_step(
    model, mesh, steps_per_call: int, logit_scale: float = LOGIT_SCALE,
    openclip_norm: bool = False, remat: bool = False,
    disable_lora: bool = False, color_jitter: bool = False,
    same_batch: bool = False,
):
    """K full train steps per dispatch via `lax.scan` — the TPU-native
    answer to per-dispatch overhead (host round-trips, executable dispatch;
    through the axon tunnel the fixed cost is seconds per call,
    PERF_NOTES.md round 2).

    The scanned batch has a leading (K, ...) axis (stack K loader batches).
    Semantics are IDENTICAL to K sequential `make_train_step` calls: each
    inner step is a full forward/backward/AdamW on its own batch with
    full-batch InfoNCE negatives, and the per-step dropout stream is the
    same `fold_in(rng, state.step)` (tests/test_train_step.py parity test).
    Returns (state, losses[K]) so per-step logging cadence is preserved
    (reference train_epoch.py:58-59).

    `same_batch=True`: the input is ONE (B, ...) batch scanned K times
    (xs=None; the batch is a loop constant). Per-step compute/optimizer
    semantics are unchanged — only the data repeats — so this is for
    synthetic benchmarking/burn-in where the (K, B, ...) stack's HBM
    footprint (and, through the axon tunnel, its footprint-scaled dispatch
    overhead) must be excluded. The dropout/aug stream still advances via
    `fold_in(rng, state.step)`.
    """
    from bioscan_clip_tpu.data.transforms import (
        train_transform_auto as train_transform,
    )

    wrap = jax.checkpoint if remat else (lambda f: f)
    encoders = {
        "image": (model.image_encoder, model.encode_image),
        "dna": (model.dna_encoder, model.encode_dna),
        "language": (model.language_encoder, model.encode_language),
    }
    towers = {
        name: wrap(
            functools.partial(
                lambda p, x, r, _m: model.apply(
                    {"params": _tower_params(p)}, x, deterministic=False,
                    rngs={"dropout": r}, method=_m,
                ),
                _m=method,
            )
        )
        for name, (enc, method) in encoders.items()
        if enc is not None
    }

    def loss_fn(params, batch, dropout_rng):
        aug_rng, r_img, r_dna, r_txt = jax.random.split(dropout_rng, 4)
        image = batch.get("image")
        if image is None and "image_u8" in batch:
            image = train_transform(
                batch["image_u8"], aug_rng, normalize=openclip_norm,
                jitter=color_jitter,
            )
        inputs = {
            "image": (image, r_img),
            "dna": (batch.get("dna"), r_dna),
            "language": (batch.get("language"), r_txt),
        }
        embs = {}
        for name, tower in towers.items():
            x, r = inputs[name]
            embs[name] = tower(params, x, r) if x is not None else None
        return multimodal_contrastive_loss(
            embs, batch["labels"], logit_scale_value(params, logit_scale)
        )

    from bioscan_clip_tpu.train.state import (
        grads_to_full_tree,
        merge_partitions,
        param_labels,
        partition_params,
    )

    @functools.partial(
        jax.jit,
        donate_argnums=(0,),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )
    def train_steps(state, batches, rng):
        labels = param_labels(state.params, disable_lora=disable_lora)

        def body(state, batch):
            dropout_rng = jax.random.fold_in(rng, state.step)
            trainable, frozen = partition_params(state.params, labels)

            def loss_t(tr):
                return loss_fn(
                    merge_partitions(tr, frozen), batch, dropout_rng
                )

            loss, g = jax.value_and_grad(loss_t)(trainable)
            grads = grads_to_full_tree(g, state.params)
            return state.apply_gradients(grads), loss

        if same_batch:
            return jax.lax.scan(
                lambda s, _: body(s, batches), state, None,
                length=steps_per_call,
            )
        return jax.lax.scan(body, state, batches, length=steps_per_call)

    return train_steps


def stack_batches(batches):
    """Stack K loader batch dicts -> one dict with a leading (K, ...) axis
    (the input of make_scan_train_step).

    Stacks on HOST (np.stack): the result crosses to the device as ONE
    contiguous transfer per leaf in shard_stacked_batches. jnp.stack here
    would instead ship every per-step leaf separately (K transfers each
    paying host->device latency) and run the stack as a device op whose
    output is then resharded — measured 49 samples/s pipeline-fed vs the
    604/s device rate through the high-latency dev tunnel (r4)."""
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def make_accum_train_step(
    model, mesh, accum_steps: int, logit_scale: float = LOGIT_SCALE,
    openclip_norm: bool = False, remat: bool = False,
    disable_lora: bool = False, color_jitter: bool = False,
):
    """Gradient-accumulation train step: the batch is split into
    `accum_steps` microbatches scanned sequentially; gradients are averaged
    before one optimizer update.

    NOTE on loss semantics: the InfoNCE negatives come from each
    *microbatch* (the reference's default per-rank ContrastiveLoss
    semantics, loss_func.py:29-54), not the full accumulated batch. For
    full-batch negatives under accumulation use
    `make_gradcache_train_step` (the default in train_cl).
    """
    from bioscan_clip_tpu.data.transforms import (
        train_transform_auto as train_transform,
    )

    def split_batch(batch, n):
        def sp(x):
            return x.reshape((n, x.shape[0] // n) + x.shape[1:])

        return jax.tree.map(sp, batch)

    wrap = jax.checkpoint if remat else (lambda f: f)
    towers = {}
    for name, method in (
        ("image", model.encode_image),
        ("dna", model.encode_dna),
        ("language", model.encode_language),
    ):
        enc = getattr(model, f"{name}_encoder")
        if enc is not None:
            towers[name] = wrap(
                functools.partial(
                    lambda p, x, r, _m: model.apply(
                        {"params": _tower_params(p)}, x, deterministic=False,
                        rngs={"dropout": r}, method=_m,
                    ),
                    _m=method,
                )
            )

    def loss_fn(params, mb, dropout_rng):
        aug_rng, r_img, r_dna, r_txt = jax.random.split(dropout_rng, 4)
        image = mb.get("image")
        if image is None and "image_u8" in mb:
            image = train_transform(
                mb["image_u8"], aug_rng, normalize=openclip_norm,
                jitter=color_jitter,
            )
        inputs = {
            "image": (image, r_img),
            "dna": (mb.get("dna"), r_dna),
            "language": (mb.get("language"), r_txt),
        }
        embs = {
            n: (t(params, *inputs[n]) if inputs[n][0] is not None else None)
            for n, t in towers.items()
        }
        return multimodal_contrastive_loss(
            embs, mb["labels"], logit_scale_value(params, logit_scale)
        )

    from bioscan_clip_tpu.train.state import (
        grads_to_full_tree,
        merge_partitions,
        param_labels,
        partition_params,
    )

    @functools.partial(
        jax.jit,
        donate_argnums=(0,),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )
    def train_step(state, batch, rng):
        micro = split_batch(batch, accum_steps)
        dropout_rng = jax.random.fold_in(rng, state.step)
        labels = param_labels(state.params, disable_lora=disable_lora)
        trainable, frozen = partition_params(state.params, labels)

        def body(carry, mb):
            acc_grads, acc_loss, i = carry

            def loss_t(tr):
                return loss_fn(
                    merge_partitions(tr, frozen), mb,
                    jax.random.fold_in(dropout_rng, i),
                )

            loss, grads = jax.value_and_grad(loss_t)(trainable)
            return (
                jax.tree.map(jnp.add, acc_grads, grads),
                acc_loss + loss,
                i + 1,
            ), None

        zero = jax.tree.map(
            lambda p: None if p is None else jnp.zeros_like(p),
            trainable,
            is_leaf=lambda x: x is None,
        )
        (g, loss, _), _ = jax.lax.scan(
            body, (zero, jnp.float32(0), jnp.int32(0)), micro
        )
        g = jax.tree.map(lambda x: x / accum_steps, g)
        grads = grads_to_full_tree(g, state.params)
        return state.apply_gradients(grads), loss / accum_steps

    return train_step


def make_gradcache_train_step(
    model, mesh, accum_steps: int, logit_scale: float = LOGIT_SCALE,
    openclip_norm: bool = False, disable_lora: bool = False,
    color_jitter: bool = False, steps_per_call: int = 1,
    same_batch: bool = False, merged_model=None,
    s1_image_batch: int = 0, cache_aug: bool = False,
    s1_chunk: int = 0,
):
    """Gradient accumulation with FULL-batch InfoNCE negatives (GradCache,
    Gao et al. 2021) — the reference's batch-400 ClipLoss semantics
    (loss_func.py:117-136) at a fraction of the activation memory:

      1. scan microbatches without grad, caching the (mb, D) embeddings;
      2. one loss over the full (B, B) similarity -> d loss / d embeddings;
      3. scan microbatches again, recomputing each forward and pulling the
         cached embedding cotangent back into parameter grads via VJP.

    The dropout/augmentation rngs are derived identically in stages 1 and 3
    (fold_in per microbatch index), so the recomputed embeddings equal the
    cached ones and the accumulated gradient is EXACTLY the full-batch
    gradient (tested against make_train_step in tests/test_accum_step.py).
    Peak activation memory is one microbatch's towers; cost is one extra
    forward.

    `merged_model`: optional rank-0 clone of `model` (load_clip_model with
    lora_rank=0). Stage 1 is a no-grad pass, so it can run with the LoRA
    adapters FOLDED into the projection kernels (models/lora.py
    merge_lora_params, recomputed per macro-step — a rank-4 einsum per
    projection, trivial next to the forward) — removing every per-layer
    adapter op from stage 1 (merged forwards measured +9%, PERF_NOTES).
    Stage 3's VJP keeps the adapter form (it needs adapter grads). The
    cached embeddings then differ from stage 3's implicit recompute only
    by compute-dtype rounding of the same math; gradient equality is
    bounded by tests/test_accum_step.py.

    `s1_image_batch`: if >0, stage 1 computes the IMAGE embeddings in
    chunks of this many samples (one big forward per chunk) instead of
    per-microbatch. Valid because the ViT tower is dropout-free (timm
    ViT-B defaults, models/vit.py dropout=0.0), so its forward is
    deterministic: batching changes only XLA tiling (compute-dtype
    rounding), not the math — the same equality class as `merged_model`.
    A mb-20 forward underutilizes the chip; chunked stage-1 image
    forwards run at extraction-bench efficiency. BERT towers (real
    dropout, per-microbatch rng streams) always stay per-microbatch.
    Must divide accum_steps * microbatch; 0 disables.

    `cache_aug`: stage 1 returns its augmented images and stage 3
    consumes them directly, skipping the bit-identical (same aug rng)
    train_transform recompute. Costs (B, 224, 224, 3) of activation
    memory per macro-step (~120 MB at B=400 bf16); exact by
    construction.

    `s1_chunk`: if >0, stage 1 embeds EVERY tower in chunks of this many
    samples (supersedes s1_image_batch, which only chunks the dropout-free
    image tower). The BERT towers have active dropout, so this switches
    the whole step to batch-composition-invariant row-keyed dropout
    (models/common.py ps_dropout): each row's masks depend only on
    (step seed, its position in the global batch), never on grouping —
    stage 3's per-microbatch recompute then reproduces stage 1's chunked
    embeddings exactly (up to compute-dtype tiling rounding, the
    merged_model equality class). A mb-20 BERT forward underutilizes the
    chip the same way the image forward does; chunked stage 1 runs all
    three towers at extraction-bench batch geometry. Requires towers that
    accept `row_seeds` (the native BERT towers do); must divide
    accum_steps * microbatch.
    """
    from bioscan_clip_tpu.data.transforms import (
        train_transform_auto as train_transform,
    )

    if disable_lora:
        merged_model = None  # no adapters to fold

    def make_towers(m):
        out = {}
        for name, method in (
            ("image", m.encode_image),
            ("dna", m.encode_dna),
            ("language", m.encode_language),
        ):
            enc = getattr(m, f"{name}_encoder")
            if enc is not None:
                out[name] = functools.partial(
                    lambda p, x, r, _m, row_seeds=None: m.apply(
                        {"params": _tower_params(p)}, x, deterministic=False,
                        rngs={"dropout": r}, method=_m,
                        **(
                            {}
                            if row_seeds is None
                            else {"row_seeds": row_seeds}
                        ),
                    ),
                    _m=method,
                )
        return out

    towers = make_towers(model)
    towers_s1 = make_towers(merged_model) if merged_model else towers

    if s1_chunk:
        img_cfg = getattr(getattr(model, "image_encoder", None), "cfg", None)
        if img_cfg is not None and getattr(img_cfg, "dropout", 0.0) > 0:
            raise ValueError(
                "s1_chunk requires a dropout-free image tower (row-keyed "
                "dropout is implemented for the BERT towers)"
            )

    def embed_micro(params, mb, rng_i, tw=towers, skip=(), return_aug=False,
                    row_seeds=None):
        # row_seeds: optional {"dna"/"language": (mb,) uint32} — row-keyed
        # dropout (s1_chunk mode); the flax rngs stay as fallbacks for
        # towers that don't take row_seeds
        aug_rng, r_img, r_dna, r_txt = jax.random.split(rng_i, 4)
        image = mb.get("image")
        if image is None and "image_u8" in mb:
            image = train_transform(
                mb["image_u8"], aug_rng, normalize=openclip_norm,
                jitter=color_jitter,
            )
        rs = row_seeds or {}
        inputs = {
            "image": (image, r_img, None),
            "dna": (mb.get("dna"), r_dna, rs.get("dna")),
            "language": (mb.get("language"), r_txt, rs.get("language")),
        }
        out = {
            n: tw[n](params, inputs[n][0], inputs[n][1],
                     row_seeds=inputs[n][2])
            for n in tw
            if inputs[n][0] is not None and n not in skip
        }
        if return_aug:
            return out, image
        return out

    def split_batch(batch, n):
        return jax.tree.map(
            lambda x: x.reshape((n, x.shape[0] // n) + x.shape[1:]), batch
        )

    from bioscan_clip_tpu.train.state import (
        grads_to_full_tree,
        merge_partitions,
        param_labels,
        partition_params,
    )

    def macro_step(state, batch, rng):
        inputs = {k: v for k, v in batch.items() if k != "labels"}
        micro = split_batch(inputs, accum_steps)
        dropout_rng = jax.random.fold_in(rng, state.step)
        labels_tree = param_labels(state.params, disable_lora=disable_lora)
        trainable, frozen = partition_params(state.params, labels_tree)
        p_full = merge_partitions(trainable, frozen)

        # stage 1: cache embeddings, no grad — with merged_model the
        # adapters are folded ONCE here and the pass runs rank-0
        if merged_model is not None:
            from bioscan_clip_tpu.models.lora import merge_lora_params

            p_s1 = merge_lora_params(p_full)
        else:
            p_s1 = p_full

        has_img = "image" in towers and (
            "image" in micro or "image_u8" in micro
        )
        total = batch["labels"].shape[0]
        mb_size = total // accum_steps
        seeds_mod = None
        if s1_chunk:
            # ---- fully chunked stage 1 (row-keyed dropout, see docstring)
            n_chunks, rem = divmod(total, s1_chunk)
            if rem:
                raise ValueError(
                    f"s1_chunk={s1_chunk} must divide the global batch "
                    f"{total}"
                )
            from bioscan_clip_tpu.models.common import row_seeds_init

            bits = jax.random.bits(dropout_rng, dtype=jnp.uint32)
            rows = jnp.arange(total)
            # distinct per-tower seed spaces so dna/language masks never
            # correlate at equal (site, position)
            seeds_mod = {
                "dna": row_seeds_init(bits ^ jnp.uint32(0x0D5A17), rows),
                "language": row_seeds_init(
                    bits ^ jnp.uint32(0x7A9C33), rows
                ),
            }

            def chunked(x):
                return x.reshape((n_chunks, s1_chunk) + x.shape[1:])

            cached = {}
            aug_img = 0
            keep_img = has_img
            if has_img:
                pre = inputs.get("image")
                aug_base = jax.random.fold_in(dropout_rng, 0xA06)

                def img_body(_, xc):
                    u8_or_im, c = xc
                    im = u8_or_im
                    if pre is None:
                        im = train_transform(
                            u8_or_im, jax.random.fold_in(aug_base, c),
                            normalize=openclip_norm, jitter=color_jitter,
                        )
                    # rng unused: the image tower is dropout-free (checked
                    # at factory build time)
                    return None, (
                        towers_s1["image"](p_s1, im, dropout_rng), im
                    )

                xs_img = (
                    chunked(pre if pre is not None else inputs["image_u8"]),
                    jnp.arange(n_chunks),
                )
                _, (img_e, img_a) = jax.lax.scan(img_body, None, xs_img)
                cached["image"] = img_e.reshape(accum_steps, mb_size, -1)
                aug_img = img_a.reshape(
                    (accum_steps, mb_size) + img_a.shape[2:]
                )
            for name in ("dna", "language"):
                if name not in towers or inputs.get(name) is None:
                    continue

                def s1_bert(_, xc, _n=name):
                    x, s = xc
                    return None, towers_s1[_n](
                        p_s1, x, dropout_rng, row_seeds=s
                    )

                xs_b = (
                    jax.tree.map(chunked, inputs[name]),
                    chunked(seeds_mod[name]),
                )
                _, e = jax.lax.scan(s1_bert, None, xs_b)
                cached[name] = e.reshape(accum_steps, mb_size, -1)
        else:
            s1_skip = ("image",) if (s1_image_batch and has_img) else ()
            keep_img = has_img and (bool(s1_skip) or cache_aug)

            def s1(_, xi):
                mb, i = xi
                out, img = embed_micro(
                    p_s1, mb, jax.random.fold_in(dropout_rng, i),
                    tw=towers_s1, skip=s1_skip, return_aug=True,
                )
                return None, (out, img if keep_img else 0)

            _, (cached, aug_img) = jax.lax.scan(
                s1, None, (micro, jnp.arange(accum_steps))
            )
            if s1_skip:
                # big-batch image forwards over the stage-1 aug images: the
                # ViT tower is deterministic (no dropout), so any batch
                # grouping computes the same per-row math
                flat = aug_img.reshape((-1,) + aug_img.shape[2:])
                chunk = min(int(s1_image_batch), total)
                n_chunks, rem = divmod(total, chunk)
                if rem:
                    raise ValueError(
                        f"s1_image_batch={s1_image_batch} must divide the "
                        f"global batch {total}"
                    )

                def s1i(_, im):
                    # rng is unused by the dropout-free tower; pass any key
                    return None, towers_s1["image"](p_s1, im, dropout_rng)

                _, img_emb = jax.lax.scan(
                    s1i, None,
                    flat.reshape((n_chunks, chunk) + flat.shape[1:]),
                )
                cached["image"] = img_emb.reshape(
                    (accum_steps, -1) + img_emb.shape[2:]
                )
        full = {k: v.reshape(-1, v.shape[-1]) for k, v in cached.items()}

        # stage 2: full-batch loss -> embedding cotangents. With the
        # learnable temperature the scale's gradient flows ONLY through this
        # stage (the cached embeddings are constants w.r.t. the scale), so
        # differentiate w.r.t. the trainable tree too and fold that in.
        learnable_scale = (
            isinstance(state.params, dict) and "logit_scale" in state.params
        )

        def s2_loss(e, tr):
            return multimodal_contrastive_loss(
                e, batch["labels"],
                logit_scale_value(
                    merge_partitions(tr, frozen), logit_scale
                ),
            )

        if learnable_scale:
            loss, (emb_grads, scale_grads) = jax.value_and_grad(
                s2_loss, argnums=(0, 1)
            )(full, trainable)
        else:
            loss, emb_grads = jax.value_and_grad(s2_loss)(full, trainable)
            scale_grads = None
        emb_grads_micro = {
            k: v.reshape((accum_steps, -1) + v.shape[1:])
            for k, v in emb_grads.items()
        }

        # stage 3: recompute each microbatch forward, VJP the cotangent.
        # When stage 1 kept its augmented images (keep_img), reuse them
        # here — the transform output is bit-identical (same aug rng), so
        # skipping the recompute is exact. In s1_chunk mode the per-mb
        # row seeds reproduce stage 1's chunked dropout masks exactly
        # (row-keyed: grouping-invariant by construction).
        seeds_mb = None
        if seeds_mod is not None:
            seeds_mb = {
                k: v.reshape(accum_steps, mb_size)
                for k, v in seeds_mod.items()
                if k in towers and inputs.get(k) is not None
            }

        def s3(acc, xi):
            mb = xi["mb"]
            if keep_img:
                mb = {k: v for k, v in mb.items() if k != "image_u8"}
                mb["image"] = xi["img"]

            def f(tr):
                return embed_micro(
                    merge_partitions(tr, frozen), mb,
                    jax.random.fold_in(dropout_rng, xi["i"]),
                    row_seeds=xi.get("seeds"),
                )

            _, vjp = jax.vjp(f, trainable)
            (g,) = vjp(xi["g"])
            return jax.tree.map(jnp.add, acc, g), None

        zero = jax.tree.map(
            lambda p: None if p is None else jnp.zeros_like(p),
            trainable,
            is_leaf=lambda x: x is None,
        )
        s3_xs = {
            "mb": micro,
            "g": emb_grads_micro,
            "i": jnp.arange(accum_steps),
        }
        if keep_img:
            s3_xs["img"] = aug_img
        if seeds_mb:
            s3_xs["seeds"] = seeds_mb
        g, _ = jax.lax.scan(s3, zero, s3_xs)
        if scale_grads is not None:
            g = jax.tree.map(
                lambda a, b: None if a is None else a + b,
                g, scale_grads, is_leaf=lambda x: x is None,
            )
        grads = grads_to_full_tree(g, state.params)
        return state.apply_gradients(grads), loss

    jit_wrap = functools.partial(
        jax.jit,
        donate_argnums=(0,),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )
    if steps_per_call <= 1:
        return jit_wrap(macro_step)

    # K GradCache macro-steps per device dispatch: lax.scan whose body is
    # one full gradcache step — composes the batch-400 single-chip recipe
    # with the per-dispatch-overhead amortization of make_scan_train_step
    # (`tpu.steps_per_call` x `tpu.accum_steps` in the CLI). The stacked
    # input is (K, B, ...) like make_scan_train_step's; `same_batch=True`
    # scans ONE (B, ...) batch K times (xs=None loop constant) — same
    # per-macro-step compute/optimizer semantics (the dropout/aug stream
    # still advances via fold_in(rng, state.step)), for synthetic
    # benchmarking where the K-scaled input stack must be excluded.
    @jit_wrap
    def train_steps(state, batches, rng):
        def body(st, b):
            return macro_step(st, b, rng)

        if same_batch:
            return jax.lax.scan(
                lambda st, _: body(st, batches), state, None,
                length=steps_per_call,
            )
        return jax.lax.scan(body, state, batches, length=steps_per_call)

    return train_steps


def make_embed_step(model, mesh, modality: str, openclip_norm: bool = False,
                    pre_cropped: bool = False):
    """Jitted inference step for one modality -> normalized (B, D) embeddings
    (the hot loop of get_feature_and_label, inference_epoch.py:8-68). uint8
    image batches get the deterministic eval transform on device
    (Resize 256 -> CenterCrop 224, dataset.py:194-200); `pre_cropped` skips
    the resize+crop for loaders that ship host-center-cropped (224, 224)
    frames (bit-identical, ~2x fewer feed bytes)."""
    from bioscan_clip_tpu.data.transforms import eval_transform

    method = {
        "image": model.encode_image,
        "dna": model.encode_dna,
        "language": model.encode_language,
    }[modality]

    @jax.jit
    def embed(params, inputs):
        if modality == "image" and inputs.dtype == jnp.uint8:
            inputs = eval_transform(
                inputs, normalize=openclip_norm, pre_cropped=pre_cropped
            )
        return model.apply(
            {"params": params}, inputs, deterministic=True, method=method
        )

    return embed


def extract_features(
    state_params, model, mesh, dataloader, modalities=("language", "dna", "image"),
    for_key_set: bool = False, openclip_norm: bool = False, progress=None,
    group_samples=None,
):
    """Full-split feature extraction -> split dict (the reference's
    get_features_and_label, inference_and_eval.py:734-783: one pass per
    modality over the dataloader, L2-normalized outputs, label dicts and
    ids collected host-side).

    `group_samples`: dispatch amortization — merge loader batches until
    ~this many rows are buffered, then run ALL towers over the merged
    group in ONE jit call (see _extract_features_grouped). Default: the
    BSCAN_EXTRACT_GROUP env var, else 1600 on TPU / 0 (off) elsewhere.
    The train path amortizes per-dispatch overhead with
    K-steps-per-dispatch scans (make_scan_train_step); this is the
    extraction-side analogue (VERDICT r4 #2: per-batch tower dispatches
    through a seconds-per-round-trip tunnel held extraction to 7 /s
    against a ~500 /s loader ceiling)."""
    import numpy as np

    from bioscan_clip_tpu.retrieval.report import build_split_dict

    if group_samples is None:
        import os as _os

        env = _os.environ.get("BSCAN_EXTRACT_GROUP")
        if env is not None:
            group_samples = int(env)
        else:
            group_samples = 1600 if jax.default_backend() == "tpu" else 0
    if group_samples and int(group_samples) > 0:
        return _extract_features_grouped(
            state_params, model, mesh, dataloader, modalities, for_key_set,
            openclip_norm, progress, int(group_samples),
        )

    steps = {
        m: make_embed_step(
            model, mesh, m, openclip_norm=openclip_norm,
            pre_cropped=(
                m == "image"
                and getattr(dataloader, "eval_pre_cropped", False)
            ),
        )
        for m in modalities
        if getattr(model, f"{'language' if m == 'language' else m}_encoder")
        is not None
    }
    feats = {m: [] for m in steps}
    label_dicts = []
    ids = []
    import collections
    import time as _time

    from bioscan_clip_tpu.parallel.mesh import shard_batch_padded

    # Device results are fetched through a small sliding window instead of
    # per-dispatch np.asarray: a blocking fetch after every tower dispatch
    # serializes host decode, H2D transfer, and compute (through the dev
    # tunnel each round trip costs ~0.1 s). A few batches of deferred
    # (B, D) embeddings bound device memory while the current batch's
    # towers overlap the next batch's transfer and host work.
    pending = collections.deque()  # (modality, device array, valid rows)
    # window size: 4 batches of towers by default; BSCAN_EXTRACT_PENDING
    # overrides (0 = fetch synchronously every batch — diagnostic for
    # tunnel environments where a deep deferred window can stall on the
    # first drain)
    import os as _os

    window = int(_os.environ.get("BSCAN_EXTRACT_PENDING", 4)) * len(steps)

    def _drain(limit):
        while len(pending) > limit:
            m, a, k = pending.popleft()
            feats[m].append(np.asarray(a)[:k])

    _t0 = _time.perf_counter()
    for _bi, batch in enumerate(dataloader):
        if progress is not None:
            progress(_bi, _time.perf_counter() - _t0)
        label_dicts.extend(batch.get("label_dicts", []))
        ids.extend(batch.get("ids", []))
        for m, step in steps.items():
            if m == "image":
                inp = batch.get("image_u8", batch.get("image"))
            elif m == "dna":
                inp = batch.get("dna")
            else:
                inp = batch.get("language")
            if inp is None:
                continue
            inp, n = shard_batch_padded(inp, mesh)
            pending.append((m, step(state_params, inp), n))
        _drain(window)
    _drain(0)
    arrays = {
        m: (np.concatenate(v, axis=0) if v else None)
        for m, v in feats.items()
    }
    return build_split_dict(
        image=arrays.get("image"),
        dna=arrays.get("dna"),
        language=arrays.get("language"),
        label_list=label_dicts,
        file_name_list=ids,
        for_key_set=for_key_set,
    )


_EMBED_GROUP_CACHE = {}  # see _extract_features_grouped


def _extract_features_grouped(
    state_params, model, mesh, dataloader, modalities, for_key_set,
    openclip_norm, progress, group_samples: int,
):
    """Dispatch-amortized extraction: K loader batches merge into one jumbo
    group and ALL towers run inside ONE jit dispatch per group.

    Exactness: the eval towers are deterministic (deterministic=True, no
    dropout), so batch grouping changes only XLA tiling — the same
    compute-dtype equality class as the merged-LoRA / chunked GradCache
    stage-1 forwards (tests/test_data_pipeline.py::
    test_extract_features_grouped_equality checks grouped == per-batch). The final partial group is padded by repeating the last
    row (shapes stay fixed -> one compile) and trimmed on fetch.

    Why it's fast: per group of G rows the host pays ONE dispatch + one
    contiguous H2D transfer per modality instead of 3*K tower dispatches;
    the device runs every tower at extraction-bench batch geometry (~0.34
    ms/sample merged bf16, docs/BENCHMARKS.md) while the deferred-fetch
    window overlaps the next group's decode + transfer.
    """
    import collections
    import os as _os
    import time as _time

    import numpy as np

    from bioscan_clip_tpu.data.transforms import eval_transform
    from bioscan_clip_tpu.parallel.mesh import shard_batch_padded
    from bioscan_clip_tpu.retrieval.report import build_split_dict

    avail = [
        m for m in modalities
        if getattr(model, f"{'language' if m == 'language' else m}_encoder")
        is not None
    ]
    pre_cropped = bool(getattr(dataloader, "eval_pre_cropped", False))
    # One jitted embed_group per (model, norm, crop, modalities) — cached
    # across calls so train_cl's eval phase (3 extract_features calls per
    # epoch, identical group shapes) compiles the expensive jumbo-group
    # program ONCE instead of once per call (flax Modules hash by field
    # values, so same-config models hit too).
    cache_key = (model, openclip_norm, pre_cropped, tuple(avail))
    embed_group = _EMBED_GROUP_CACHE.get(cache_key)
    if embed_group is None:

        @jax.jit
        def embed_group(params, inputs):
            methods = {
                "image": model.encode_image,
                "dna": model.encode_dna,
                "language": model.encode_language,
            }
            out = {}
            for m, x in inputs.items():
                if m == "image" and x.dtype == jnp.uint8:
                    x = eval_transform(
                        x, normalize=openclip_norm, pre_cropped=pre_cropped
                    )
                out[m] = model.apply(
                    {"params": params}, x, deterministic=True,
                    method=methods[m],
                )
            return out

        while len(_EMBED_GROUP_CACHE) >= 4:  # bound stale-model entries
            _EMBED_GROUP_CACHE.pop(next(iter(_EMBED_GROUP_CACHE)))
        _EMBED_GROUP_CACHE[cache_key] = embed_group

    feats = {m: [] for m in avail}
    label_dicts, ids = [], []
    pending = collections.deque()  # (device result dict, valid rows)
    # deferred-fetch window in GROUPS (each holds 3 (G, D) embeddings —
    # a few MB); 0 = fetch synchronously (diagnostic)
    window = int(_os.environ.get("BSCAN_EXTRACT_PENDING_GROUPS", 2))

    def _drain(limit):
        while len(pending) > limit:
            res, k = pending.popleft()
            for m, a in res.items():
                feats[m].append(np.asarray(a)[:k])

    state = {"buf": [], "rows": 0, "capacity": None}

    def _inputs_of(batch):
        d = {}
        if "image" in avail:
            x = batch.get("image_u8", batch.get("image"))
            if x is not None:
                d["image"] = x
        for m in ("dna", "language"):
            if m in avail and batch.get(m) is not None:
                d[m] = batch[m]
        return d

    def _flush():
        if not state["buf"]:
            return
        group = jax.tree.map(
            lambda *xs: np.concatenate(xs, axis=0), *state["buf"]
        )
        n = state["rows"]
        cap = state["capacity"]
        if cap and n < cap:
            pad = cap - n
            group = jax.tree.map(
                lambda x: np.concatenate(
                    [x, np.repeat(x[-1:], pad, axis=0)], axis=0
                ),
                group,
            )
        sharded, _ = shard_batch_padded(group, mesh)
        pending.append((embed_group(state_params, sharded), n))
        state["buf"], state["rows"] = [], 0
        _drain(window)

    t0 = _time.perf_counter()
    for bi, batch in enumerate(dataloader):
        if progress is not None and not state["buf"]:
            progress(bi, _time.perf_counter() - t0)
        label_dicts.extend(batch.get("label_dicts", []))
        ids.extend(batch.get("ids", []))
        d = _inputs_of(batch)
        if not d:
            continue
        b = jax.tree.leaves(d)[0].shape[0]
        if state["capacity"] is None:
            k = max(1, -(-group_samples // b))
            state["capacity"] = k * b
        state["buf"].append(d)
        state["rows"] += b
        if state["rows"] >= state["capacity"]:
            _flush()
    _flush()
    _drain(0)
    arrays = {
        m: (np.concatenate(v, axis=0) if v else None)
        for m, v in feats.items()
    }
    return build_split_dict(
        image=arrays.get("image"),
        dna=arrays.get("dna"),
        language=arrays.get("language"),
        label_list=label_dicts,
        file_name_list=ids,
        for_key_set=for_key_set,
    )


def train_epoch(
    state,
    train_step,
    dataloader,
    mesh,
    rng,
    epoch: int,
    total_epochs: int,
    log_every: int = 20,
    logger=None,
    wandb_run=None,
    profile_dir=None,
    profile_steps: int = 5,
    steps_per_call: int = 1,
    scan_step_factory=None,
):
    """One epoch over a host dataloader yielding batch dicts.

    Replaces epoch/train_epoch.py:11-61: per-step forward/backward/step +
    per-step scheduler + per-step metric logging (loss, lr, step time) —
    without the reference's permanently-enabled anomaly mode.

    `profile_dir`: capture a jax.profiler (Perfetto) trace of the first
    `profile_steps` steps (SURVEY.md §5.1 upgrade — the reference has no
    profiler).

    `steps_per_call > 1` + `scan_step_factory` (k -> make_scan_train_step):
    K loader batches are stacked and run as ONE device dispatch
    (make_scan_train_step) — amortizes per-dispatch overhead; per-step
    losses come back from the scan so logging cadence is unchanged. The
    epoch tail uses a lazily-built shorter scan (one extra compile), so no
    batch is dropped.
    """
    losses = []
    t_start = time.perf_counter()
    n_samples = 0
    tracing = False
    # steady-state marker: set at the FIRST loss fetch (i.e. after the
    # first dispatch, which carries jit compile). The returned
    # samples_per_s_steady excludes that warmup so pipeline-fed epoch
    # rates are comparable to bench.py's compile-excluded numbers.
    steady = None  # (t, samples_seen_at_t)

    # Per-step loss logging with a ONE-STEP delay: step i's device scalar is
    # fetched after step i+1 is enqueued, so the host never stalls the device
    # pipeline. Full per-step loss curves (reference train_epoch.py:58-59
    # logs every step) at TPU-async cost.
    pending = None  # (step index, device loss, samples seen up to the step)

    def record(idx, loss_dev, n_seen=None):
        nonlocal steady
        loss_v = float(loss_dev)
        if steady is None:
            steady = (time.perf_counter(),
                      n_samples if n_seen is None else n_seen)
        losses.append(loss_v)
        if logger is not None and (idx % log_every == 0 or idx < 3):
            n = n_samples if n_seen is None else n_seen
            logger(
                f"epoch {epoch}/{total_epochs} step {idx} "
                f"loss {loss_v:.4f} "
                f"({n / (time.perf_counter() - t_start):.1f} samples/s)"
            )
        if wandb_run is not None:
            wandb_run.log({"loss": loss_v, "epoch": epoch, "step": idx})

    if steps_per_call > 1 and scan_step_factory is not None:
        from bioscan_clip_tpu.parallel.mesh import shard_stacked_batches

        scan_steps = {}  # chunk size -> compiled scanned step
        # dispatch i's device losses are fetched AFTER dispatch i+1 is
        # enqueued (the scan-mode analogue of plain mode's one-step-delayed
        # `pending`): the fetch is then one bulk np.asarray per dispatch
        # instead of K synchronous scalar reads stalling the device queue
        pending_chunk = None  # (base step index, device loss vector)

        def flush_chunk():
            nonlocal pending_chunk
            if pending_chunk is not None:
                b0, lk = pending_chunk
                pending_chunk = None
                for j, lv in enumerate(np.asarray(lk)):
                    record(b0 + j, lv)

        def run_chunk(state, chunk, base_idx):
            nonlocal n_samples, pending_chunk
            k = len(chunk)
            if k == 1:
                b = shard_batch(device_batch(chunk[0]), mesh)
                n_samples += int(b["labels"].shape[0])
                state, loss = train_step(state, b, rng)
                flush_chunk()
                pending_chunk = (base_idx, jnp.reshape(loss, (1,)))
                return state
            if k not in scan_steps:
                scan_steps[k] = scan_step_factory(k)
            stacked = shard_stacked_batches(
                stack_batches([device_batch(b) for b in chunk]), mesh
            )
            n_samples += int(stacked["labels"].shape[1]) * k
            state, losses_k = scan_steps[k](state, stacked, rng)
            flush_chunk()
            pending_chunk = (base_idx, losses_k)
            return state

        chunk, base = [], 0
        for batch in dataloader:
            chunk.append(batch)
            if len(chunk) == steps_per_call:
                if profile_dir and base == 0:
                    # profile the first K-step dispatch (covers the first
                    # profile_steps steps and more — one dispatch is the
                    # smallest traceable unit in scan mode)
                    jax.profiler.start_trace(profile_dir)
                    state = run_chunk(state, chunk, base)
                    jax.block_until_ready(state.params)
                    jax.profiler.stop_trace()
                    if logger is not None:
                        logger(
                            f"profiler trace (first {steps_per_call}-step "
                            f"dispatch) -> {profile_dir}"
                        )
                else:
                    state = run_chunk(state, chunk, base)
                base += len(chunk)
                chunk = []
        if chunk:
            state = run_chunk(state, chunk, base)
        flush_chunk()
    else:
        for i, batch in enumerate(dataloader):
            if profile_dir and i == 0:
                jax.profiler.start_trace(profile_dir)
                tracing = True
            batch = shard_batch(device_batch(batch), mesh)
            n_samples += int(batch["labels"].shape[0])
            state, loss = train_step(state, batch, rng)
            if pending is not None:
                record(*pending)
            # capture the sample count as of THIS step: the deferred fetch
            # happens after step i+1 is enqueued, and samples/s must not
            # include that extra batch
            pending = (i, loss, n_samples)
            if tracing and i + 1 >= profile_steps:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                tracing = False
                if logger is not None:
                    logger(
                        f"profiler trace ({profile_steps} steps) -> "
                        f"{profile_dir}"
                    )
    if pending is not None:
        record(*pending)
    if tracing:
        jax.profiler.stop_trace()
    # block on the last step so epoch timing is honest
    jax.block_until_ready(state.params)
    dur = time.perf_counter() - t_start
    stats = {
        "epoch_time_s": dur,
        "samples_per_s": n_samples / dur if dur > 0 else 0.0,
        "mean_loss": float(np.mean(losses)) if losses else float("nan"),
    }
    if steady is not None and n_samples > steady[1]:
        sdur = time.perf_counter() - steady[0]
        stats["samples_per_s_steady"] = (
            (n_samples - steady[1]) / sdur if sdur > 0 else 0.0
        )
    return state, stats
