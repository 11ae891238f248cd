"""Classification-head variants for supervised fine-tuning.

Parity targets:
- EncoderWithExtraLayer (util/util.py:13-25) / ViTWIthExtraLayer
  (method_two_fine_tuning_and_eval.py:24-36): encoder + one Linear.
- SimpleCLIPWithClassificationHead (simple_clip.py:82-122): CLIP towers with
  an MLP softmax head (768 -> hidden -> hidden -> n_classes, ReLU, Softmax)
  over the image embedding; image tower trainable, dna/text frozen.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from bioscan_clip_tpu.models.clip import l2_normalize


class EncoderWithHead(nn.Module):
    """encoder output -> Linear(n_classes). `get_feature` returns the raw
    encoder embedding (util.py:19-20)."""

    encoder: nn.Module
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    def get_feature(self, x, deterministic: bool = True):
        return self.encoder(x, deterministic=deterministic)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = self.encoder(x, deterministic=deterministic)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="new_linear_layer")(h)


class ClassificationHeadMLP(nn.Module):
    """768 -> hidden -> hidden -> n_classes with ReLU + Softmax
    (simple_clip.py:99-106 — yes, Softmax inside the module; CE over these
    probabilities is what the reference trains)."""

    hidden_dim: int = 768
    num_classes: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc3")(x)
        return nn.softmax(x.astype(jnp.float32), axis=-1)


class CLIPWithClassificationHead(nn.Module):
    """SimpleCLIPWithClassificationHead parity: normalized tower embeddings
    plus the classification output over the image embedding."""

    image_encoder: Optional[nn.Module]
    dna_encoder: Optional[nn.Module]
    language_encoder: Optional[nn.Module]
    hidden_dim: int = 768
    num_classes: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_input=None,
        dna_input=None,
        language_input=None,
        deterministic: bool = True,
    ):
        image_output = dna_output = language_output = None
        if image_input is not None and self.image_encoder is not None:
            image_output = l2_normalize(
                self.image_encoder(
                    image_input, deterministic=deterministic
                ).astype(jnp.float32)
            )
        if dna_input is not None and self.dna_encoder is not None:
            dna_output = l2_normalize(
                self.dna_encoder(
                    dna_input, deterministic=deterministic
                ).astype(jnp.float32)
            )
        if language_input is not None and self.language_encoder is not None:
            language_output = l2_normalize(
                self.language_encoder(
                    language_input["input_ids"],
                    attention_mask=language_input.get("attention_mask"),
                    token_type_ids=language_input.get("token_type_ids"),
                    deterministic=deterministic,
                ).astype(jnp.float32)
            )
        head = ClassificationHeadMLP(
            self.hidden_dim, self.num_classes, self.dtype,
            name="classification_head",
        )
        output = head(image_output)
        return image_output, dna_output, language_output, output
