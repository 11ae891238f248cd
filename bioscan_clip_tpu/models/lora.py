"""LoRA parameterization as first-class Flax parameters (no module surgery).

The reference grafts LoRA via runtime module replacement
(bioscanclip/model/image_encoder.py:15-48, dna_encoder.py:40-49,
language_encoder.py:24-33): rank-4 adapters on the q and v projections only,
with A ~ kaiming_uniform(a=sqrt(5)) and B = 0, so the adapted model starts
exactly at the pretrained function.

Here LoRA is a declarative parameter of the attention modules: when
`lora_rank > 0`, each attention layer owns `lora_q_a/lora_q_b/lora_v_a/
lora_v_b` kernels. Trainability is enforced functionally via an optax
param-label mask (train/state.py), the idiomatic JAX replacement for
`requires_grad` freezing (reference: image_encoder.py:66-68).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import random


def lora_a_init(key, shape, dtype=jnp.float32):
    """Matches torch kaiming_uniform_(a=sqrt(5)) on a torch Linear weight of
    shape (r, dim): bound = 1/sqrt(fan_in) with fan_in = dim.

    Our kernel layout is (dim, r) (JAX x @ A convention), so fan_in is
    shape[0].
    """
    bound = 1.0 / jnp.sqrt(shape[0])
    return random.uniform(key, shape, dtype, -bound, bound)


def lora_b_init(key, shape, dtype=jnp.float32):
    """B starts at zero so the LoRA delta is initially the identity-preserving
    zero function (image_encoder.py:102-106)."""
    return jnp.zeros(shape, dtype)


def lora_delta(x, a_kernel, b_kernel, dtype):
    """delta = (x @ A) @ B — two skinny matmuls; rank is tiny (4) so this is
    VPU/MXU-cheap and XLA fuses it into the surrounding projection."""
    return jnp.dot(x.astype(dtype), a_kernel.astype(dtype)).dot(
        b_kernel.astype(dtype)
    )


def merge_lora_params(params):
    """Fold every LoRA adapter into its host projection kernel and drop the
    adapter params — the standard LoRA deployment transform (W' = W + A@B,
    valid because the adapter reads the same input as the host Dense).

    Returns a tree loadable by the same architecture built with
    `lora_rank=0`: inference then runs zero adapter matmuls and zero
    slice-updates per layer. The fold is computed in the param dtype (fp32),
    so merged-vs-unmerged outputs differ only by compute-dtype rounding
    (bounded by tests/test_merge_lora.py).

    Handles all three host layouts in this codebase:
    - ViT fused `qkv` (deltas on the q and v column slices — the
      `_LoRA_qkv_timm` contract, reference image_encoder.py:42-48),
    - OpenCLIP packed `in_proj` (q, k and v slices — loratorch
      enable_lora=['q','k','v'], reference util.py:301-307),
    - HF BERT separate `query`/`value` Dense modules
      (reference dna_encoder.py:70-88).
    """

    def fold(a, b):
        # (..., d, r) @ (..., r, d) with optional leading nn.scan layer axis
        return jnp.einsum("...ir,...rj->...ij", a, b)

    def walk(node):
        if not isinstance(node, dict):
            return node
        node = {k: walk(v) for k, v in node.items()}
        if "lora_q_a" not in node:
            return node

        def delta(slot, dtype):
            # fold in fp32, store in the host kernel's dtype: with
            # tpu.frozen_dtype=bfloat16 the adapters stay fp32 while the
            # frozen kernel is bf16 — an uncast scatter-add would be a
            # dtype-promotion error in future JAX (and the merged forward
            # computes in the tower dtype anyway)
            d = fold(
                node.pop(f"lora_{slot}_a"), node.pop(f"lora_{slot}_b")
            )
            return d.astype(dtype)

        if "qkv" in node:
            kern = node["qkv"]["kernel"]
            d = kern.shape[-1] // 3
            kern = kern.at[..., :d].add(delta("q", kern.dtype))
            kern = kern.at[..., 2 * d :].add(delta("v", kern.dtype))
            node["qkv"] = {**node["qkv"], "kernel": kern}
        elif "in_proj" in node:
            kern = node["in_proj"]["kernel"]
            d = kern.shape[-1] // 3
            for i, slot in enumerate(("q", "k", "v")):
                kern = kern.at[..., i * d : (i + 1) * d].add(
                    delta(slot, kern.dtype)
                )
            node["in_proj"] = {**node["in_proj"], "kernel": kern}
        elif "query" in node and "value" in node:
            for slot, mod in (("q", "query"), ("v", "value")):
                node[mod] = {
                    **node[mod], "kernel": node[mod]["kernel"]
                    + delta(slot, node[mod]["kernel"].dtype)
                }
        else:
            raise ValueError(
                "found lora_q_a with no known host projection "
                f"(siblings: {sorted(node)})"
            )
        return node

    return walk(params)
