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
