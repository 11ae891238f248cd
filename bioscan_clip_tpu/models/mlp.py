"""MLP encoders for pre-extracted-feature inputs.

Parity: bioscanclip/model/mlp.py:23-37 — Linear(in->hidden) ReLU
Linear(hidden->hidden) ReLU Linear(hidden->out).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MLPEncoder(nn.Module):
    hidden_dim: int = 512
    output_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.relu(x)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="fc3")(x)


class IdentityEncoder(nn.Module):
    """Freeze_DNA_Encoder parity (dna_encoder.py:108-113): pass pre-extracted
    features through unchanged."""

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return x
