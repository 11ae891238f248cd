"""TrainState: params + optax AdamW with functional freezing.

The reference freezes pretrained weights with requires_grad=False and trains
only the LoRA adapters plus each tower's fresh projection (image `head`
image_encoder.py:94-95, DNA `decoder` dna_encoder.py:93-95, text `proj`
language_encoder.py:78), using AdamW(lr from lr_config, default 1e-3)
over model.parameters() (train_cl.py:158).

Here freezing is an optax.multi_transform mask over the param tree — the
idiomatic functional-JAX equivalent. With `disable_lora` everything is
trainable (simple_clip.py:199-201).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

TRAINABLE_HEAD_NAMES = ("head", "decoder", "proj")

# Modules whose parameters are CONSUMED in fp32: every LayerNorm in the
# towers runs at dtype=float32 (models/common.py ln_dtype — checkpoint-parity
# numerics), so its scale/bias must stay fp32. Everything else (Dense/Conv/
# Embed kernels+biases, raw pos/cls/proj params) is cast to the module
# compute dtype (bfloat16 on TPU) at every use.
LN_MODULE_NAMES = frozenset({
    "norm", "norm1", "norm2",                           # ViT (timm names)
    "emb_ln", "attn_ln", "out_ln", "transform_ln",      # BERT towers
    "ln_1", "ln_2", "ln_pre", "ln_post", "ln_final",    # OpenCLIP towers
})


def cast_frozen_params(params, dtype=jnp.bfloat16, disable_lora: bool = False):
    """Store bf16-consumed FROZEN leaves in `dtype` (tpu.frozen_dtype knob).

    With bfloat16 compute the towers cast every Dense/Conv/Embed param to
    bf16 per use (flax promote_dtype), so storing those frozen leaves in
    bf16 is BIT-IDENTICAL compute — it just halves the resident frozen-tree
    footprint (~900 -> ~460 MB for the flagship) and the weight HBM reads
    in the forward and the backward's dx matmuls. LN params (fp32
    consumers) and all trainable leaves (AdamW masters) stay fp32.

    Only meaningful when the model computes in bfloat16; callers gate on
    that (cli/train_cl.py, bench.py) so fp32 parity paths are untouched.
    """
    labels = param_labels(params, disable_lora=disable_lora)

    def cast(path, leaf, lab):
        if lab != "frozen" or leaf.dtype != jnp.float32:
            return leaf
        keys = [getattr(p, "key", None) for p in path]
        if any(k in LN_MODULE_NAMES for k in keys):
            return leaf
        return leaf.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params, labels)


def param_labels(params, disable_lora: bool = False):
    """Label each leaf 'trainable' or 'frozen' by its tree path."""

    def label_path(path):
        keys = [getattr(p, "key", None) for p in path]
        # optional learnable temperature (train/loop.py make_logit_scale_param):
        # trained without weight decay, like CLIP's logit_scale
        if keys and keys[0] == "logit_scale":
            return "scale"
        if disable_lora:
            return "trainable"
        for k in keys:
            if isinstance(k, str) and k.startswith("lora_"):
                return "trainable"
        # fresh projections live at the top of each tower: the full-rank
        # trainable heads. Identify by the *last module* name.
        for k in keys[:-1]:
            if k in TRAINABLE_HEAD_NAMES:
                return "trainable"
        # MLP/identity encoders (feature input_type) are fully trainable.
        for k in keys:
            if k in ("fc1", "fc2", "fc3") and not any(
                isinstance(kk, str) and kk in ("blocks", "layers", "bert")
                for kk in keys
            ):
                return "trainable"
        return "frozen"

    return jax.tree_util.tree_map_with_path(
        lambda path, _: label_path(path), params
    )


def partition_params(params, labels):
    """Split the param tree into (trainable, frozen) trees with None
    placeholders — lets jax.grad differentiate the trainable subset only
    (LoRA training then skips every frozen-weight dW matmul in the
    backward: ~1/3 of backward FLOPs and the full-size gradient tree)."""

    def pick(frozen: bool):
        return jax.tree.map(
            lambda p, l: p if (l == "frozen") == frozen else None,
            params, labels,
        )

    return pick(False), pick(True)


def merge_partitions(trainable, frozen):
    """Inverse of partition_params."""
    return jax.tree.map(
        lambda a, b: b if a is None else a,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )


def grads_to_full_tree(grads_trainable, params):
    """Expand trainable-only grads to the full tree (zeros for frozen —
    optax.set_to_zero ignores them, so XLA dead-code-eliminates the
    zeros)."""
    return jax.tree.map(
        lambda g, p: jnp.zeros_like(p) if g is None else g,
        grads_trainable,
        params,
        is_leaf=lambda x: x is None,
    )


def count_trainable(params, labels) -> tuple:
    tr = fr = 0
    for leaf, lab in zip(
        jax.tree.leaves(params), jax.tree.leaves(labels)
    ):
        if lab != "frozen":
            tr += leaf.size
        else:
            fr += leaf.size
    return tr, fr


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Any = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt
        )


def create_train_state(
    model,
    params,
    schedule,
    disable_lora: bool = False,
    weight_decay: float = 0.01,
) -> TrainState:
    """AdamW (torch defaults: b1=0.9 b2=0.999 eps=1e-8 wd=0.01) masked to the
    trainable subset; frozen leaves get set_to_zero (no state, no update)."""
    labels = param_labels(params, disable_lora=disable_lora)
    tx = optax.multi_transform(
        {
            "trainable": optax.adamw(
                learning_rate=schedule, weight_decay=weight_decay
            ),
            # learnable logit scale: Adam WITHOUT weight decay (decaying a
            # log-temperature toward 0 would anneal tau toward 1)
            "scale": optax.adam(learning_rate=schedule),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
