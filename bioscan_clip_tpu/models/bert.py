"""Flax BERT encoder (HF geometry) + the two BIOSCAN-CLIP heads built on it.

Two instantiations:
- **BarcodeBERT** (DNA): BertForMaskedLM geometry with vocab_size=1027 and
  BERT-base dimensions (reference: bioscanclip/model/dna_encoder.py:14-22,
  BertConfig defaults: 12L/768h/12 heads/3072 FFN). The MLM decoder is
  replaced by a fresh Linear(768 -> output_dim) and the forward pools as
  `softmax(logits, axis=-1).mean(axis=1)` — softmax over the 768 *output*
  dim then mean over the 133 tokens (dna_encoder.py:103-105). This quirk is
  checkpoint-load-bearing and replicated exactly.
- **BERT-small** (text): prajjwal1/bert-small geometry (4L/512h/8 heads/2048
  FFN), pooling = mean over *all* last_hidden_state tokens (including pads —
  language_encoder.py:87-89 does not mask the mean) then Linear(512 -> 768).

HF behavioral details matched: post-LN residuals, LN eps 1e-12, exact-erf
GELU, embeddings = word + position + token_type with LN, attention bias from
`(1-mask)*-10000`-style masking (we use -inf-safe large negative in fp32).

TPU-first: `nn.scan` stacked layers, bf16-ready matmuls, fp32 softmax/LN.
"""

from __future__ import annotations

import dataclasses
import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from bioscan_clip_tpu.models.common import (
    gelu_exact,
    ln_dtype,
    ps_dropout,
    remat_policy,
    row_salt_advance,
    site_seed,
)
from bioscan_clip_tpu.models.lora import lora_a_init, lora_b_init, lora_delta
from bioscan_clip_tpu.ops.attention import fused_attention_enabled, mha

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    lora_rank: int = 4
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    ln_eps: float = 1e-12
    # Per-layer remat inside the nn.scan (see ViTConfig.remat).
    remat: bool = False
    # Remat save-policy: "full" | "dots" | "narrow" (common.py:remat_policy).
    remat_policy: str = "full"


BARCODE_BERT_CONFIG = BertConfig(vocab_size=1027)
BERT_SMALL_CONFIG = BertConfig(
    vocab_size=30522,
    hidden_size=512,
    num_layers=4,
    num_heads=8,
    intermediate_size=2048,
)


class BertLayer(nn.Module):
    """One post-LN BERT layer with separate q/k/v and LoRA on q and v
    (dna_encoder.py:70-88, language_encoder.py:54-72)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, deterministic: bool = True):
        # scan carry: (hidden states, additive mask, per-row dropout salt).
        # row_salt is None in legacy mode (flax rng dropout) or a (B,)
        # uint32 vector in batch-composition-invariant mode (common.py
        # ps_dropout docs) — each layer consumes its salt and passes the
        # advanced chain to the next layer.
        x, attn_bias, row_salt = carry
        c = self.cfg
        d = c.hidden_size
        h = c.num_heads
        hd = d // h

        q = nn.Dense(d, dtype=self.dtype, name="query")(x)
        k = nn.Dense(d, dtype=self.dtype, name="key")(x)
        v = nn.Dense(d, dtype=self.dtype, name="value")(x)
        if c.lora_rank > 0:
            a_q = self.param("lora_q_a", lora_a_init, (d, c.lora_rank))
            b_q = self.param("lora_q_b", lora_b_init, (c.lora_rank, d))
            a_v = self.param("lora_v_a", lora_a_init, (d, c.lora_rank))
            b_v = self.param("lora_v_b", lora_b_init, (c.lora_rank, d))
            q = q + lora_delta(x, a_q, b_q, self.dtype)
            v = v + lora_delta(x, a_v, b_v, self.dtype)

        B, N, _ = x.shape
        use_fused = fused_attention_enabled()
        if (
            not deterministic
            and c.attention_dropout > 0
            and os.environ.get("BSCAN_INKERNEL_DROPOUT", "1") == "0"
        ):
            # escape hatch: fall back to XLA attention for training if the
            # in-kernel dropout misbehaves on a given Mosaic version
            use_fused = False
        if use_fused:
            # Fused Pallas MHA (ops/attention.py): fp32 softmax in VMEM, no
            # (B, h, N, N) HBM round trip — in eval AND training: attention
            # dropout runs IN-KERNEL via a counter-based RNG whose mask the
            # backward recomputes bit-exactly (ops/attention.py mha docs).
            bias2d = None
            if attn_bias is not None:
                bias2d = attn_bias[:, 0, 0, :]  # (B, N) key-padding bias
            rate = 0.0 if deterministic else float(c.attention_dropout)
            seed = None
            if rate > 0:
                if row_salt is not None:
                    seed = site_seed(row_salt, 1)  # (B,) row-keyed
                else:
                    seed = jax.random.bits(
                        self.make_rng("dropout"), dtype=jnp.uint32
                    )
            y = checkpoint_name(
                mha(q, k, v, heads=h, bias=bias2d, scale=hd**-0.5,
                    dropout_rate=rate, dropout_seed=seed),
                "attn_ctx",
            )
        else:
            q = q.reshape(B, N, h, hd)
            k = k.reshape(B, N, h, hd)
            v = v.reshape(B, N, h, hd)
            # scores/softmax in the module compute dtype (see vit.py note);
            # fp32 modules keep exact fp32 softmax for checkpoint parity.
            attn = jnp.einsum(
                "bnhd,bmhd->bhnm", q, k, preferred_element_type=self.dtype
            ) * (hd**-0.5)
            if attn_bias is not None:
                attn = attn + attn_bias.astype(attn.dtype)  # (B,1,1,N) mask
            attn = jax.nn.softmax(attn, axis=-1)
            if c.attention_dropout > 0:
                if row_salt is not None:
                    if not deterministic:
                        # same counter formula as the fused kernel's
                        # in-VMEM mask -> bit-equal masks across paths
                        from bioscan_clip_tpu.ops.attention import (
                            dropout_keep_4d,
                        )

                        attn = attn * dropout_keep_4d(
                            site_seed(row_salt, 1), B, h, N,
                            float(c.attention_dropout),
                        ).astype(attn.dtype)
                else:
                    attn = nn.Dropout(c.attention_dropout)(
                        attn, deterministic=deterministic
                    )
            y = jnp.einsum(
                "bhnm,bmhd->bnhd", attn.astype(self.dtype), v
            ).reshape(B, N, d)
        y = nn.Dense(d, dtype=self.dtype, name="attn_out")(y)
        if c.hidden_dropout > 0:
            if row_salt is not None:
                y = ps_dropout(
                    y, c.hidden_dropout, row_salt, 2, deterministic
                )
            else:
                y = nn.Dropout(c.hidden_dropout)(
                    y, deterministic=deterministic
                )
        x = checkpoint_name(
            nn.LayerNorm(epsilon=c.ln_eps, name="attn_ln", dtype=ln_dtype())(
                x + y
            ).astype(self.dtype),
            "ln_out",
        )

        y = nn.Dense(c.intermediate_size, dtype=self.dtype, name="inter")(x)
        y = checkpoint_name(y, "mlp_pre")
        # HF 'gelu' is exact erf; gelu_exact is bit-identical and tags the
        # erfc intermediate for the "dots_act" remat policy.
        y = gelu_exact(y)
        y = nn.Dense(d, dtype=self.dtype, name="out")(y)
        if c.hidden_dropout > 0:
            if row_salt is not None:
                y = ps_dropout(
                    y, c.hidden_dropout, row_salt, 3, deterministic
                )
            else:
                y = nn.Dropout(c.hidden_dropout)(
                    y, deterministic=deterministic
                )
        x = checkpoint_name(
            nn.LayerNorm(epsilon=c.ln_eps, name="out_ln", dtype=ln_dtype())(
                x + y
            ).astype(self.dtype),
            "ln_out",
        )
        next_salt = None if row_salt is None else row_salt_advance(row_salt)
        return (x, attn_bias, next_salt), None


class BertEncoder(nn.Module):
    """Embeddings + scanned layers -> last_hidden_state (B, N, D)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        deterministic: bool = True,
        row_seeds=None,
    ):
        c = self.cfg
        B, N = input_ids.shape
        # row_seeds: optional (B,) uint32 — switches every dropout in the
        # tower to batch-composition-invariant keying (common.py ps_dropout
        # docs): row b's masks depend only on row_seeds[b], so embedding a
        # row inside any chunk/microbatch grouping is bit-identical.
        row_salt = None
        if row_seeds is not None:
            row_salt = jnp.asarray(row_seeds).astype(jnp.uint32)
        word = nn.Embed(
            c.vocab_size, c.hidden_size, name="word_embeddings",
            dtype=self.dtype,
        )(input_ids)
        pos_ids = jnp.arange(N)[None, :]
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size,
            name="position_embeddings", dtype=self.dtype,
        )(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        typ = nn.Embed(
            c.type_vocab_size, c.hidden_size, name="token_type_embeddings",
            dtype=self.dtype,
        )(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=c.ln_eps, name="emb_ln", dtype=ln_dtype())(
            x
        ).astype(self.dtype)
        if c.hidden_dropout > 0:
            if row_salt is not None:
                x = ps_dropout(
                    x, c.hidden_dropout, row_salt, 0, deterministic
                )
            else:
                x = nn.Dropout(c.hidden_dropout)(
                    x, deterministic=deterministic
                )

        attn_bias = None
        if attention_mask is not None:
            attn_bias = jnp.where(
                attention_mask[:, None, None, :] > 0, 0.0, NEG_INF
            ).astype(jnp.float32)

        layer_cls = BertLayer
        if c.remat:
            layer_cls = nn.remat(
                BertLayer,
                prevent_cse=False,
                static_argnums=(2,),
                policy=remat_policy(c.remat_policy),
            )
        layer = nn.scan(
            layer_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=c.num_layers,
            in_axes=nn.broadcast,
        )(c, self.dtype, name="layers")
        # the embedding site used the raw salt; layers start on the
        # advanced chain so site streams never collide across depth
        layer_salt = None if row_salt is None else row_salt_advance(row_salt)
        (x, _, _), _ = layer((x, attn_bias, layer_salt), deterministic)
        return x


class BarcodeBertDnaEncoder(nn.Module):
    """BarcodeBERT + MLM transform head + fresh decoder + softmax-mean pool.

    Forward parity with LoRA_barcode_bert (dna_encoder.py:103-105):
      hidden = bert(tokens)                    # no attention mask: all-ones
      h      = LN(gelu(dense(hidden)))         # HF BertPredictionHeadTransform
      logits = decoder(h)                      # replaced Linear(768, 768)
      out    = softmax(logits, -1).mean(1)
    """

    cfg: BertConfig = BARCODE_BERT_CONFIG
    output_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, deterministic: bool = True,
                 row_seeds=None):
        x = BertEncoder(self.cfg, self.dtype, name="bert")(
            input_ids, deterministic=deterministic, row_seeds=row_seeds
        )
        d = self.cfg.hidden_size
        # BertPredictionHeadTransform (loaded from the BarcodeBERT ckpt).
        x = nn.Dense(d, dtype=self.dtype, name="transform_dense")(x)
        x = gelu_exact(x)
        x = nn.LayerNorm(
            epsilon=self.cfg.ln_eps, name="transform_ln", dtype=jnp.float32
        )(x)
        # Replaced decoder: fresh, trainable (dna_encoder.py:93-95).
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="decoder")(x)
        # softmax over the *output feature* dim, mean over tokens — in fp32
        # (the softmax output values are ~1e-3; bf16 would quantize badly).
        x = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
        return x.mean(axis=1)


class BertTextEncoder(nn.Module):
    """BERT-small + unmasked token mean + Linear(hidden -> output_dim).

    Forward parity with LoRA_bert (language_encoder.py:87-89):
    `proj(last_hidden_state.mean(dim=1))` — the mean runs over all padded
    positions, NOT masked by attention_mask. Replicated exactly.
    """

    cfg: BertConfig = BERT_SMALL_CONFIG
    output_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        deterministic: bool = True,
        row_seeds=None,
    ):
        x = BertEncoder(self.cfg, self.dtype, name="bert")(
            input_ids,
            attention_mask=attention_mask,
            token_type_ids=token_type_ids,
            deterministic=deterministic,
            row_seeds=row_seeds,
        )
        x = x.mean(axis=1)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="proj")(x)
