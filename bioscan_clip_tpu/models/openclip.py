"""OpenCLIP-geometry towers (ViT-L/14 ablation path, `for_open_clip`).

Reference behavior (simple_clip.py:36-44, 141-145): the ablation configs
build open_clip 'ViT-L/14' (commonpool_xl_laion_s13b_b90k) and add LoRA
(r=4, q/k/v) to every attention via loratorch
(util.py:309-359, image_encoder.py:119-151). Text is tokenized in-forward
with the CLIP BPE tokenizer at context length 77.

Flax reimplementation (OpenCLIP module layout):
- visual: conv1 (14x14, no bias) -> class_embedding + positional_embedding
  -> ln_pre -> 24 pre-LN blocks (MultiheadAttention packed qkv, MLP 4x,
  exact GELU) -> ln_post -> CLS @ proj (1024 -> 768);
- text: token_embedding (49408) + positional_embedding (77) -> 12 blocks
  with causal mask -> ln_final -> take the EOT position (argmax token id)
  @ text_projection.

LoRA(q/k/v, rank r) is parameterized the same way as the other towers
(lora_{q,k,v}_{a,b} on the packed projection slices).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from bioscan_clip_tpu.models.common import gelu_exact, remat_policy
from bioscan_clip_tpu.models.lora import lora_a_init, lora_b_init, lora_delta
from bioscan_clip_tpu.ops.attention import fused_attention_enabled, mha_packed


@dataclasses.dataclass(frozen=True)
class OpenClipVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    output_dim: int = 768
    lora_rank: int = 4
    ln_eps: float = 1e-5
    # Per-layer remat inside the nn.scan (see ViTConfig.remat).
    remat: bool = False
    remat_policy: str = "full"  # full | dots | narrow (common.remat_policy)


@dataclasses.dataclass(frozen=True)
class OpenClipTextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 768
    lora_rank: int = 4
    ln_eps: float = 1e-5
    # Per-layer remat inside the nn.scan (see ViTConfig.remat).
    remat: bool = False
    remat_policy: str = "full"  # full | dots | narrow (common.remat_policy)


class OpenClipBlock(nn.Module):
    """ResidualAttentionBlock: pre-LN, torch-MultiheadAttention packed qkv,
    4x MLP with exact GELU. Optional additive attention mask (causal for
    text)."""

    width: int
    heads: int
    lora_rank: int
    ln_eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, deterministic: bool = True):
        x, mask = carry
        d = self.width
        h = self.heads
        hd = d // h

        y = nn.LayerNorm(epsilon=self.ln_eps, name="ln_1",
                         dtype=jnp.float32)(x).astype(self.dtype)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="in_proj")(y)
        if self.lora_rank > 0:
            # LoRA on q, k, v slices (loratorch enable_lora=['q','k','v'])
            deltas = []
            for name in ("q", "k", "v"):
                a = self.param(f"lora_{name}_a", lora_a_init,
                               (d, self.lora_rank))
                b = self.param(f"lora_{name}_b", lora_b_init,
                               (self.lora_rank, d))
                deltas.append(lora_delta(y, a, b, self.dtype))
            qkv = qkv + jnp.concatenate(deltas, axis=-1)
        B, N, _ = qkv.shape
        if fused_attention_enabled():
            # Fused Pallas MHA with the (N, N) causal mask applied in-kernel
            # (ops/attention.py); scores never touch HBM.
            m2 = None if mask is None else mask.reshape(mask.shape[-2:])
            y = checkpoint_name(
                mha_packed(qkv, heads=h, scale=hd**-0.5, mask=m2), "attn_ctx"
            )
        else:
            qkv = qkv.reshape(B, N, 3, h, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            attn = jnp.einsum(
                "bnhd,bmhd->bhnm", q, k, preferred_element_type=self.dtype
            ) * (hd**-0.5)
            if mask is not None:
                attn = attn + mask.astype(attn.dtype)
            attn = jax.nn.softmax(attn, axis=-1)
            y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, d)
        y = nn.Dense(d, dtype=self.dtype, name="out_proj")(y)
        x = x + y

        y = nn.LayerNorm(epsilon=self.ln_eps, name="ln_2",
                         dtype=jnp.float32)(x).astype(self.dtype)
        y = nn.Dense(4 * d, dtype=self.dtype, name="c_fc")(y)
        y = checkpoint_name(y, "mlp_pre")
        y = gelu_exact(y)  # bit-identical erf GELU, "dots_act"-saveable
        y = nn.Dense(d, dtype=self.dtype, name="c_proj")(y)
        return (x + y, mask), None


def _scan_blocks(cfg_width, cfg_heads, lora_rank, ln_eps, layers, dtype,
                 name="resblocks", remat=False, policy="full"):
    block_cls = OpenClipBlock
    if remat:
        block_cls = nn.remat(
            OpenClipBlock,
            prevent_cse=False,
            static_argnums=(2,),
            policy=remat_policy(policy),
        )
    return nn.scan(
        block_cls,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        length=layers,
        in_axes=nn.broadcast,
    )(cfg_width, cfg_heads, lora_rank, ln_eps, dtype, name=name)


class OpenClipImageTower(nn.Module):
    cfg: OpenClipVisionConfig = OpenClipVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        c = self.cfg
        x = nn.Conv(
            c.width, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            use_bias=False, dtype=self.dtype, name="conv1",
        )(images.astype(self.dtype))
        B = x.shape[0]
        x = x.reshape(B, -1, c.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.width,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, c.width)).astype(self.dtype), x],
            axis=1,
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.02),
            ((c.image_size // c.patch_size) ** 2 + 1, c.width),
        )
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(epsilon=c.ln_eps, name="ln_pre",
                         dtype=jnp.float32)(x).astype(self.dtype)
        (x, _), _ = _scan_blocks(
            c.width, c.heads, c.lora_rank, c.ln_eps, c.layers, self.dtype,
            remat=c.remat,
            policy=c.remat_policy,
        )((x, None), deterministic)
        x = nn.LayerNorm(epsilon=c.ln_eps, name="ln_post",
                         dtype=jnp.float32)(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(c.width**-0.5),
            (c.width, c.output_dim),
        )
        return jnp.dot(x.astype(self.dtype), proj.astype(self.dtype))


class OpenClipTextTower(nn.Module):
    cfg: OpenClipTextConfig = OpenClipTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids, deterministic: bool = True):
        """token_ids: (B, 77) int32 CLIP-BPE tokens (EOT = highest id)."""
        c = self.cfg
        x = nn.Embed(
            c.vocab_size, c.width, name="token_embedding", dtype=self.dtype
        )(token_ids)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (c.context_length, c.width),
        )
        x = x + pos[: x.shape[1]].astype(self.dtype)
        n = x.shape[1]
        causal = jnp.triu(
            jnp.full((n, n), -1e9, jnp.float32), k=1
        )[None, None]
        (x, _), _ = _scan_blocks(
            c.width, c.heads, c.lora_rank, c.ln_eps, c.layers, self.dtype,
            remat=c.remat,
            policy=c.remat_policy,
        )((x, causal), deterministic)
        x = nn.LayerNorm(epsilon=c.ln_eps, name="ln_final",
                         dtype=jnp.float32)(x)
        # pool at the EOT token (highest token id per row)
        eot = jnp.argmax(token_ids, axis=-1)
        pooled = jnp.take_along_axis(
            x, eot[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        proj = self.param(
            "text_projection", nn.initializers.normal(c.width**-0.5),
            (c.width, c.output_dim),
        )
        return jnp.dot(pooled.astype(self.dtype), proj.astype(self.dtype))


class OpenClipTextAdapter(nn.Module):
    """Adapts OpenClipTextTower to the MultiModalCLIP language-encoder
    signature (dict input with input_ids; attention/token-type masks are
    not used — CLIP text is causal with EOT pooling)."""

    cfg: OpenClipTextConfig = OpenClipTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic: bool = True):
        return OpenClipTextTower(self.cfg, self.dtype, name="text")(
            input_ids, deterministic=deterministic
        )


# --------------------------------------------------------------------------
# torch open_clip state-dict conversion
# --------------------------------------------------------------------------

def _t(x):
    import numpy as np

    return np.ascontiguousarray(np.asarray(x).T)


def _lora_pair(sd: dict, attn_prefix: str, slot: str):
    """Find the loratorch LoRA (A, B) pair for q/k/v on an attention module.

    The released `for_open_clip` checkpoints wrap each `attn` in a loratorch
    `MultiheadAttention(enable_lora=['q','k','v'], r=4)`
    (reference util.py:309-359). loratorch registers per-slot parameters on
    the module; we accept the naming spellings used across its releases:
    `{q}_lora_A`, `{q}_proj_lora_A`, `lora_A_{q}` (A: (r, d); B: (d, r) —
    loralib conventions). Returns (A, B) or None.
    """
    for fmt_a, fmt_b in (
        ("{s}_lora_A", "{s}_lora_B"),
        ("{s}_proj_lora_A", "{s}_proj_lora_B"),
        ("lora_A_{s}", "lora_B_{s}"),
        ("in_proj_lora_A_{s}", "in_proj_lora_B_{s}"),
    ):
        ka = attn_prefix + fmt_a.format(s=slot)
        kb = attn_prefix + fmt_b.format(s=slot)
        if ka in sd and kb in sd:
            return sd[ka], sd[kb]
    return None


def _convert_blocks(sd: dict, prefix: str, layers: int,
                    lora_alpha: float = 1.0) -> dict:
    """Resblock stack -> stacked scan params. Picks up loratorch LoRA
    adapters when present (released `for_open_clip` checkpoints); the
    loratorch scaling alpha/r is folded into the B factor so our unscaled
    `x @ a @ b` delta is exact."""
    import numpy as np

    cols = {
        "ln_1": {"scale": [], "bias": []},
        "in_proj": {"kernel": [], "bias": []},
        "out_proj": {"kernel": [], "bias": []},
        "ln_2": {"scale": [], "bias": []},
        "c_fc": {"kernel": [], "bias": []},
        "c_proj": {"kernel": [], "bias": []},
    }
    lora = {f"lora_{s}_{ab}": [] for s in "qkv" for ab in "ab"}
    has_lora = False
    for i in range(layers):
        L = f"{prefix}.resblocks.{i}."
        cols["ln_1"]["scale"].append(sd[L + "ln_1.weight"])
        cols["ln_1"]["bias"].append(sd[L + "ln_1.bias"])
        cols["in_proj"]["kernel"].append(_t(sd[L + "attn.in_proj_weight"]))
        cols["in_proj"]["bias"].append(sd[L + "attn.in_proj_bias"])
        cols["out_proj"]["kernel"].append(_t(sd[L + "attn.out_proj.weight"]))
        cols["out_proj"]["bias"].append(sd[L + "attn.out_proj.bias"])
        cols["ln_2"]["scale"].append(sd[L + "ln_2.weight"])
        cols["ln_2"]["bias"].append(sd[L + "ln_2.bias"])
        cols["c_fc"]["kernel"].append(_t(sd[L + "mlp.c_fc.weight"]))
        cols["c_fc"]["bias"].append(sd[L + "mlp.c_fc.bias"])
        cols["c_proj"]["kernel"].append(_t(sd[L + "mlp.c_proj.weight"]))
        cols["c_proj"]["bias"].append(sd[L + "mlp.c_proj.bias"])
        for s in "qkv":
            pair = _lora_pair(sd, L + "attn.", s)
            if pair is not None:
                a_t, b_t = pair  # torch A (r, d), B (d, r)
                r = np.asarray(a_t).shape[0]
                scale = lora_alpha / r
                has_lora = True
                lora[f"lora_{s}_a"].append(_t(a_t))          # (d, r)
                lora[f"lora_{s}_b"].append(scale * _t(b_t))  # (r, d)
    out = {
        name: {k: np.stack(v) for k, v in sub.items()}
        for name, sub in cols.items()
    }
    if has_lora:
        for k, v in lora.items():
            if len(v) != layers:
                raise ValueError(
                    f"LoRA params present for only {len(v)}/{layers} layers "
                    f"({k}); partial lora_layer lists are not supported"
                )
            out[k] = np.stack(v)
    return out


def convert_openclip_visual(sd: dict, layers: int = 24) -> dict:
    """open_clip `visual.*` keys -> OpenClipImageTower params."""
    import numpy as np

    v = {k[len("visual."):]: x for k, x in sd.items()
         if k.startswith("visual.")}
    params = {
        "conv1": {"kernel": np.transpose(v["conv1.weight"], (2, 3, 1, 0))},
        "class_embedding": v["class_embedding"],
        "positional_embedding": v["positional_embedding"],
        "ln_pre": {"scale": v["ln_pre.weight"], "bias": v["ln_pre.bias"]},
        "ln_post": {"scale": v["ln_post.weight"], "bias": v["ln_post.bias"]},
        "proj": v["proj"],  # stored (width, output_dim) already
        "resblocks": _convert_blocks(v, "transformer", layers),
    }
    return params


def convert_openclip_text(sd: dict, layers: int = 12) -> dict:
    """open_clip text keys (token_embedding/transformer/ln_final/...) ->
    OpenClipTextTower params."""
    return {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {
            "scale": sd["ln_final.weight"],
            "bias": sd["ln_final.bias"],
        },
        "text_projection": sd["text_projection"],
        "resblocks": _convert_blocks(sd, "transformer", layers),
    }
