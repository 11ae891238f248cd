"""FlatTrainState: the trainable subset packed into ONE flat buffer.

Motivation: a LoRA train step updates ~350 tiny tensors. As separate leaves,
the optimizer update launches hundreds of micro-kernels and the step's
output set is ~1400 small buffers — slow on any backend (kernel-launch
overhead) and catastrophically slow through a per-buffer-cost runtime (the
axon-tunneled TPU here: ~46 s/step measured for the update alone).

Packing the trainable leaves into a single (N,) fp32 vector makes the AdamW
update 3 fused elementwise kernels over one buffer and the step outputs
O(1) buffers. Frozen params stay an ordinary (input-only) tree. Unflattening
for the forward is dynamic-slice + reshape, which XLA fuses into the
consuming matmuls.

Gradients are computed with respect to the flat vector directly, so no
full-size gradient tree ever exists.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from bioscan_clip_tpu.train.state import param_labels


def _trainable_paths(params, labels):
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_l = jax.tree.leaves(labels)
    return [
        (path, leaf)
        for (path, leaf), lab in zip(flat_p, flat_l)
        if lab == "trainable"
    ]


class FlatSpec:
    """Static description of the packing (shapes, offsets, paths)."""

    def __init__(self, params, disable_lora: bool = False):
        labels = param_labels(params, disable_lora=disable_lora)
        entries = _trainable_paths(params, labels)
        self.paths = [p for p, _ in entries]
        self.shapes = [tuple(l.shape) for _, l in entries]
        self.dtypes = [l.dtype for _, l in entries]
        self.sizes = [int(np.prod(s)) for s in self.shapes]
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)]).tolist()
        self.total = int(self.offsets[-1])
        self.labels = labels

    def flatten(self, params) -> jnp.ndarray:
        entries = _trainable_paths(params, self.labels)
        return jnp.concatenate(
            [jnp.ravel(l).astype(jnp.float32) for _, l in entries]
        )

    def unflatten_into(self, params, flat):
        """Return params with trainable leaves replaced from `flat`."""
        pieces = {}
        for path, shape, dt, off, size in zip(
            self.paths, self.shapes, self.dtypes, self.offsets, self.sizes
        ):
            key = tuple(getattr(p, "key", p) for p in path)
            pieces[key] = (
                jax.lax.dynamic_slice(flat, (off,), (size,))
                .reshape(shape)
                .astype(dt)
            )

        def sub(path, leaf):
            key = tuple(getattr(p, "key", p) for p in path)
            return pieces.get(key, leaf)

        return jax.tree_util.tree_map_with_path(sub, params)


class FlatTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    flat: jnp.ndarray  # (N,) f32 trainable vector
    frozen_params: Any  # full tree; trainable leaves here are stale/ignored
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    spec: FlatSpec = flax.struct.field(pytree_node=False)

    @property
    def params(self):
        """Full parameter tree with current trainable values."""
        return self.spec.unflatten_into(self.frozen_params, self.flat)

    def apply_gradients(self, flat_grads):
        updates, new_opt = self.tx.update(
            flat_grads, self.opt_state, self.flat
        )
        return self.replace(
            step=self.step + 1,
            flat=optax.apply_updates(self.flat, updates),
            opt_state=new_opt,
        )


def create_flat_train_state(
    params, schedule, disable_lora: bool = False, weight_decay: float = 0.01
) -> FlatTrainState:
    spec = FlatSpec(params, disable_lora=disable_lora)
    tx = optax.adamw(learning_rate=schedule, weight_decay=weight_decay)
    flat = spec.flatten(params)
    return FlatTrainState(
        step=jnp.zeros((), jnp.int32),
        flat=flat,
        frozen_params=params,
        opt_state=tx.init(flat),
        tx=tx,
        spec=spec,
    )


def make_flat_train_step(model, mesh, logit_scale=None,
                         openclip_norm: bool = False, remat: bool = False,
                         donate: bool = True):
    """Jitted train step over a FlatTrainState (O(1) output buffers).

    `donate=False` is a perf-diagnosis knob (tools/probe_tunnel.py saga):
    keeps the input state buffers alive instead of aliasing them."""
    import functools

    from bioscan_clip_tpu.data.transforms import (
        train_transform_auto as train_transform,
    )
    from bioscan_clip_tpu.losses.contrastive import (
        multimodal_contrastive_loss,
    )
    from bioscan_clip_tpu.parallel.mesh import replicated

    if logit_scale is None:
        logit_scale = 1.0 / 0.07

    wrap = jax.checkpoint if remat else (lambda f: f)
    towers = {}
    for name, method in (
        ("image", model.encode_image),
        ("dna", model.encode_dna),
        ("language", model.encode_language),
    ):
        if getattr(model, f"{name}_encoder") is not None:
            towers[name] = wrap(
                functools.partial(
                    lambda p, x, r, _m: model.apply(
                        {"params": p}, x, deterministic=False,
                        rngs={"dropout": r}, method=_m,
                    ),
                    _m=method,
                )
            )

    def _inner(flat, opt_state, step_count, frozen_params, batch, rng,
               tx, spec):
        dropout_rng = jax.random.fold_in(rng, step_count)
        aug_rng, r_img, r_dna, r_txt = jax.random.split(dropout_rng, 4)
        image = batch.get("image")
        if image is None and "image_u8" in batch:
            image = train_transform(
                batch["image_u8"], aug_rng, normalize=openclip_norm
            )
        inputs = {
            "image": (image, r_img),
            "dna": (batch.get("dna"), r_dna),
            "language": (batch.get("language"), r_txt),
        }

        def loss_f(f):
            params = spec.unflatten_into(frozen_params, f)
            embs = {
                n: (t(params, *inputs[n]) if inputs[n][0] is not None else None)
                for n, t in towers.items()
            }
            return multimodal_contrastive_loss(
                embs, batch["labels"], logit_scale
            )

        loss, g = jax.value_and_grad(loss_f)(flat)
        updates, new_opt = tx.update(g, opt_state, flat)
        import optax as _optax

        new_flat = _optax.apply_updates(flat, updates)
        return new_flat, new_opt, step_count + 1, loss

    # donate only the small mutable leaves (flat vector + opt state + step);
    # the big frozen tree stays alive for reuse
    jitted = jax.jit(
        _inner,
        static_argnames=("tx", "spec"),
        donate_argnums=(0, 1, 2) if donate else (),
        out_shardings=replicated(mesh),
    )

    def train_step(state, batch, rng):
        new_flat, new_opt, new_step, loss = jitted(
            state.flat, state.opt_state, state.step, state.frozen_params,
            batch, rng, tx=state.tx, spec=state.spec,
        )
        return (
            state.replace(flat=new_flat, opt_state=new_opt, step=new_step),
            loss,
        )

    return train_step


def make_flat_scan_train_step(model, mesh, steps_per_call: int,
                              logit_scale=None, openclip_norm: bool = False,
                              remat: bool = False, same_batch: bool = False):
    """K flat train steps per dispatch via `lax.scan`.

    The scan carry is ONLY the mutable O(trainable) leaves — the flat
    parameter vector, its AdamW state, and the step counter (a few MB for
    LoRA training) — and only those are donated. The ~750 MB frozen
    parameter tree rides as a standing non-donated argument, uploaded once
    and cached device-side across calls. Through the axon tunnel this is
    the difference between a ~19 s per-dispatch state round-trip
    (make_scan_train_step's donated full TrainState) and a near-free
    dispatch (PERF_NOTES round 3); on a normal host it also avoids K-step
    carry traffic on the frozen tree.

    Per-step semantics match make_flat_train_step exactly (same
    fold_in(rng, step) dropout/aug streams); `same_batch=True` scans one
    (B, ...) closure batch as in make_scan_train_step.
    """
    import functools

    from bioscan_clip_tpu.data.transforms import (
        train_transform_auto as train_transform,
    )
    from bioscan_clip_tpu.losses.contrastive import (
        multimodal_contrastive_loss,
    )
    from bioscan_clip_tpu.parallel.mesh import replicated

    if logit_scale is None:
        logit_scale = 1.0 / 0.07

    wrap = jax.checkpoint if remat else (lambda f: f)
    towers = {}
    for name, method in (
        ("image", model.encode_image),
        ("dna", model.encode_dna),
        ("language", model.encode_language),
    ):
        if getattr(model, f"{name}_encoder") is not None:
            towers[name] = wrap(
                functools.partial(
                    lambda p, x, r, _m: model.apply(
                        {"params": p}, x, deterministic=False,
                        rngs={"dropout": r}, method=_m,
                    ),
                    _m=method,
                )
            )

    def _steps(flat, opt_state, step_count, frozen_params, batches, rng,
               tx, spec):
        def body(carry, batch):
            flat, opt_state, step_count = carry
            dropout_rng = jax.random.fold_in(rng, step_count)
            aug_rng, r_img, r_dna, r_txt = jax.random.split(dropout_rng, 4)
            image = batch.get("image")
            if image is None and "image_u8" in batch:
                image = train_transform(
                    batch["image_u8"], aug_rng, normalize=openclip_norm
                )
            inputs = {
                "image": (image, r_img),
                "dna": (batch.get("dna"), r_dna),
                "language": (batch.get("language"), r_txt),
            }

            def loss_f(f):
                params = spec.unflatten_into(frozen_params, f)
                embs = {
                    n: (t(params, *inputs[n])
                        if inputs[n][0] is not None else None)
                    for n, t in towers.items()
                }
                return multimodal_contrastive_loss(
                    embs, batch["labels"], logit_scale
                )

            loss, g = jax.value_and_grad(loss_f)(flat)
            updates, new_opt = tx.update(g, opt_state, flat)
            new_flat = optax.apply_updates(flat, updates)
            return (new_flat, new_opt, step_count + 1), loss

        carry = (flat, opt_state, step_count)
        if same_batch:
            carry, losses = jax.lax.scan(
                lambda c, _: body(c, batches), carry, None,
                length=steps_per_call,
            )
        else:
            carry, losses = jax.lax.scan(
                body, carry, batches, length=steps_per_call
            )
        return carry + (losses,)

    jitted = jax.jit(
        _steps,
        static_argnames=("tx", "spec"),
        donate_argnums=(0, 1, 2),
        out_shardings=replicated(mesh),
    )

    def train_steps(state, batches, rng):
        new_flat, new_opt, new_step, losses = jitted(
            state.flat, state.opt_state, state.step, state.frozen_params,
            batches, rng, tx=state.tx, spec=state.spec,
        )
        return (
            state.replace(flat=new_flat, opt_state=new_opt, step=new_step),
            losses,
        )

    return train_steps
