"""Flax ViT-B/16 with timm geometry and optional LoRA(q,v) adapters.

Architecture parity target: timm `vit_base_patch16_224`
(reference: bioscanclip/model/simple_clip.py:150) — 16x16 conv patch embed,
prepended CLS token, learned 197-token position embedding, 12 pre-LN
transformer blocks (fused qkv with bias, exact-erf GELU, LN eps 1e-6), final
LN, CLS-token pooling, and a linear head reset to `output_dim`
(image_encoder.py:94-95 — the head is the only full-rank trainable
projection; it is freshly initialized, not pretrained).

LoRA placement matches `_LoRA_qkv_timm` (image_encoder.py:42-48): the rank-r
deltas are added to the q and v slices of the *fused qkv output*.

TPU-first choices: layers run under `nn.scan` (stacked (L, ...) params →
single compiled loop body, fast compile, remat-friendly), matmuls in a
configurable compute dtype (bfloat16 on TPU) with fp32 params, softmax in
fp32.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from bioscan_clip_tpu.models.common import (
    gelu_exact,
    ln_dtype,
    remat_policy,
)
from bioscan_clip_tpu.models.lora import lora_a_init, lora_b_init, lora_delta
from bioscan_clip_tpu.ops.attention import fused_attention_enabled, mha_packed


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    num_classes: int = 768  # output_dim head (simple_clip.py:152-156)
    lora_rank: int = 4  # 0 disables LoRA (disable_lora path)
    dropout: float = 0.0
    ln_eps: float = 1e-6
    # Per-layer rematerialization inside the nn.scan: the backward saves only
    # the residual stream between layers and recomputes each block's
    # activations. Cuts train-step HBM from O(layers x tokens x mlp_dim) to
    # O(layers x tokens x hidden) at ~+1/3 forward FLOPs. Identical param
    # tree, dropout masks, and gradients (tests/test_remat.py).
    remat: bool = False
    # What the per-layer remat saves: "full" | "dots" | "narrow"
    # (models/common.py:remat_policy). "dots" keeps matmul outputs and
    # recomputes only elementwise work in the backward.
    remat_policy: str = "full"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


class ViTBlock(nn.Module):
    """One pre-LN transformer block with fused-qkv attention and LoRA(q,v)."""

    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        d = c.hidden_size
        h = c.num_heads
        hd = d // h

        y = checkpoint_name(
            nn.LayerNorm(epsilon=c.ln_eps, name="norm1", dtype=ln_dtype())(x),
            "ln_out",
        )
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(y)
        if c.lora_rank > 0:
            a_q = self.param("lora_q_a", lora_a_init, (d, c.lora_rank))
            b_q = self.param("lora_q_b", lora_b_init, (c.lora_rank, d))
            a_v = self.param("lora_v_a", lora_a_init, (d, c.lora_rank))
            b_v = self.param("lora_v_b", lora_b_init, (c.lora_rank, d))
            # Deltas on the q and v slices of the fused output
            # (image_encoder.py:46-47).
            dq = lora_delta(y, a_q, b_q, self.dtype)
            dv = lora_delta(y, a_v, b_v, self.dtype)
            qkv = qkv.at[..., :d].add(dq).at[..., 2 * d :].add(dv)

        B, N, _ = qkv.shape
        if fused_attention_enabled():
            # Fused Pallas MHA: QK^T -> fp32 softmax -> AV entirely in VMEM;
            # the (B, h, N, N) scores never touch HBM (ops/attention.py).
            y = checkpoint_name(
                mha_packed(qkv, heads=h, scale=hd**-0.5), "attn_ctx"
            )
        else:
            qkv = qkv.reshape(B, N, 3, h, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            # attention scores/softmax run in the module compute dtype: in
            # bf16 mode this halves the HBM traffic of the (B, h, N, N)
            # matrix; fp32 modules keep exact fp32 softmax.
            attn = jnp.einsum(
                "bnhd,bmhd->bhnm", q, k, preferred_element_type=self.dtype
            ) * (hd**-0.5)
            attn = jax.nn.softmax(attn, axis=-1)
            y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, d)
        y = nn.Dense(d, dtype=self.dtype, name="proj")(y)
        x = x + y

        y = checkpoint_name(
            nn.LayerNorm(epsilon=c.ln_eps, name="norm2", dtype=ln_dtype())(x),
            "ln_out",
        )
        y = nn.Dense(c.mlp_ratio * d, dtype=self.dtype, name="fc1")(y)
        y = checkpoint_name(y, "mlp_pre")
        # timm uses exact (erf) GELU; jax.nn.gelu defaults to tanh approx.
        # gelu_exact is bit-identical and tags the erfc for "dots_act" remat.
        y = gelu_exact(y)
        y = nn.Dense(d, dtype=self.dtype, name="fc2")(y)
        if c.dropout > 0:
            y = nn.Dropout(c.dropout)(y, deterministic=deterministic)
        # (carry, scan-output) protocol for nn.scan.
        return x + y, None


class ViT(nn.Module):
    """timm-geometry ViT with CLS pooling and a linear head."""

    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic: bool = True, return_tokens=False):
        """images: (B, H, W, 3) float, already preprocessed (NHWC — the
        native TPU conv layout; the reference's NCHW tensors are transposed
        at the data boundary)."""
        c = self.cfg
        x = nn.Conv(
            c.hidden_size,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(images.astype(self.dtype))
        B = x.shape[0]
        x = x.reshape(B, -1, c.hidden_size)  # (B, 196, D)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, c.hidden_size)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, c.hidden_size)).astype(self.dtype), x],
            axis=1,
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, c.num_patches + 1, c.hidden_size),
        )
        x = x + pos.astype(self.dtype)

        block_cls = ViTBlock
        if c.remat:
            # prevent_cse=False is safe (and required for efficiency) under
            # scan; static_argnums marks `deterministic` (self, x, det).
            block_cls = nn.remat(
                ViTBlock,
                prevent_cse=False,
                static_argnums=(2,),
                policy=remat_policy(c.remat_policy),
            )
        block = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=c.num_layers,
            in_axes=nn.broadcast,
        )(c, self.dtype, name="blocks")
        x, _ = block(x, deterministic)

        ln = nn.LayerNorm(epsilon=c.ln_eps, name="norm", dtype=ln_dtype())
        if return_tokens:
            return ln(x)
        # CLS pooling (timm 'token' pool for this model). LayerNorm is
        # per-token, so slicing CLS *before* the final LN is bit-identical
        # to LN-then-slice and skips 196/197 of that fp32 pass.
        x = ln(x[:, 0])
        if c.num_classes > 0:
            x = nn.Dense(c.num_classes, dtype=self.dtype, name="head")(x)
        return x
