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


class MLPVersionCLIP(nn.Module):
    """Two-tower MLP CLIP over pre-extracted features (mlp.py:11-20):
    returns L2-normalized (image, dna) embeddings."""

    image_input_dim: int = 512
    dna_input_dim: int = 768
    hidden_dim: int = 512
    output_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_feature, dna_feature, deterministic: bool = True):
        img = MLPEncoder(
            self.hidden_dim, self.output_dim, self.dtype,
            name="image_feature_encoder",
        )(image_feature)
        dna = MLPEncoder(
            self.hidden_dim, self.output_dim, self.dtype,
            name="dna_feature_encoder",
        )(dna_feature)

        def norm(x):
            n = jnp.linalg.norm(x, axis=-1, keepdims=True)
            return x / jnp.maximum(n, 1e-12)

        return norm(img.astype(jnp.float32)), norm(dna.astype(jnp.float32))


class IdentityEncoder(nn.Module):
    """Freeze_DNA_Encoder parity (dna_encoder.py:108-113): pass pre-extracted
    features through unchanged."""

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return x
