"""MultiModalCLIP: the tri-modal composite model + config-driven factory.

Parity target: SimpleCLIP (bioscanclip/model/simple_clip.py:18-50) — up to
three optional encoders; the forward L2-normalizes each present modality's
embedding and returns (image, dna, language) with None for absent ones.

`load_clip_model(args)` mirrors the reference factory
(simple_clip.py:125-203): config-driven assembly from
`args.model_config.{image,dna,language}.{input_type,model}` with
`disable_lora` support (lora_rank=0 + full-model trainability, handled by
the optax mask in train/state.py).

TPU-first: the model is one Flax module so a single pjit'ed train step
covers all three towers; embeddings come back stacked for the loss.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from bioscan_clip_tpu.models.bert import (
    BARCODE_BERT_CONFIG,
    BERT_SMALL_CONFIG,
    BarcodeBertDnaEncoder,
    BertTextEncoder,
)
from bioscan_clip_tpu.models.mlp import IdentityEncoder, MLPEncoder
from bioscan_clip_tpu.models.vit import ViT, ViTConfig


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize(p=2) parity: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


class MultiModalCLIP(nn.Module):
    """Composite of optional image / dna / language encoders.

    Call with any subset of inputs; absent modalities return None
    (simple_clip.py:27-50).
    """

    image_encoder: Optional[nn.Module]
    dna_encoder: Optional[nn.Module]
    language_encoder: Optional[nn.Module]

    def encode_image(self, images, deterministic: bool = True):
        out = self.image_encoder(images, deterministic=deterministic)
        return l2_normalize(out.astype(jnp.float32))

    def encode_dna(self, dna_tokens, deterministic: bool = True,
                   row_seeds=None):
        # row_seeds: (B,) uint32 batch-composition-invariant dropout keys
        # (models/bert.py) — only the BERT towers accept them, so forward
        # the kwarg only when set (MLP/OpenCLIP encoders don't take it)
        kw = {} if row_seeds is None else {"row_seeds": row_seeds}
        out = self.dna_encoder(dna_tokens, deterministic=deterministic, **kw)
        return l2_normalize(out.astype(jnp.float32))

    def encode_language(self, language, deterministic: bool = True,
                        row_seeds=None):
        kw = {} if row_seeds is None else {"row_seeds": row_seeds}
        out = self.language_encoder(
            language["input_ids"],
            attention_mask=language.get("attention_mask"),
            token_type_ids=language.get("token_type_ids"),
            deterministic=deterministic,
            **kw,
        )
        return l2_normalize(out.astype(jnp.float32))

    @nn.compact
    def __call__(
        self,
        image_input=None,
        dna_input=None,
        language_input=None,
        deterministic: bool = True,
    ):
        image_output = dna_output = language_output = None
        if self.image_encoder is not None and image_input is not None:
            image_output = self.encode_image(image_input, deterministic)
        if self.dna_encoder is not None and dna_input is not None:
            dna_output = self.encode_dna(dna_input, deterministic)
        if self.language_encoder is not None and language_input is not None:
            language_output = self.encode_language(language_input, deterministic)
        return image_output, dna_output, language_output


def load_clip_model(args, dtype=jnp.bfloat16, lora_rank=None):
    """Config-driven model assembly (parity: simple_clip.py:125-203).

    Returns the (uninitialized) Flax module. Parameter initialization /
    pretrained-weight loading happens in train/state.py + interop/, keeping
    model *structure* separate from *weights* (functional JAX style).

    `tpu.remat: true` in the config enables per-layer rematerialization in
    every transformer tower (see ViTConfig.remat) — same params/grads,
    O(layers) less activation HBM in the train step. `tpu.remat_policy`
    picks what the remat saves: full | dots | narrow
    (models/common.py:remat_policy; "dots" keeps MXU outputs and
    recomputes only elementwise work — near-no-remat speed at a
    fraction of the memory).

    `lora_rank` overrides the config-derived rank — inference CLIs pass 0
    after `merge_lora_params` folded the adapters into the kernels
    (`tpu.merge_lora`), so the towers run zero adapter ops.
    """
    mc = args.model_config
    disable_lora = bool(getattr(mc, "disable_lora", False))
    rank = 0 if disable_lora else 4
    if lora_rank is not None:
        rank = int(lora_rank)
    output_dim = mc.output_dim
    tpu_cfg = getattr(args, "tpu", None)
    remat = bool(tpu_cfg.get("remat", False)) if tpu_cfg else False
    rp = str(tpu_cfg.get("remat_policy", "full")) if tpu_cfg else "full"

    image_encoder = None
    dna_encoder = None
    language_encoder = None

    if (
        hasattr(mc, "image")
        and hasattr(mc, "language")
        and mc.image.model == "lora_clip_image"
        and mc.language.model == "lora_clip_text"
    ):
        # OpenCLIP ViT-L/14 ablation path (simple_clip.py:141-145)
        from bioscan_clip_tpu.models.openclip import (
            OpenClipImageTower,
            OpenClipTextAdapter,
            OpenClipTextConfig,
            OpenClipVisionConfig,
        )

        image_encoder = OpenClipImageTower(
            dataclasses.replace(
                OpenClipVisionConfig(), lora_rank=rank, output_dim=output_dim,
                remat=remat, remat_policy=rp,
            ),
            dtype=dtype,
        )
        language_encoder = OpenClipTextAdapter(
            dataclasses.replace(
                OpenClipTextConfig(), lora_rank=rank, output_dim=output_dim,
                remat=remat, remat_policy=rp,
            ),
            dtype=dtype,
        )
        if hasattr(mc, "dna"):
            dna_encoder = BarcodeBertDnaEncoder(
                dataclasses.replace(BARCODE_BERT_CONFIG, lora_rank=rank, remat=remat, remat_policy=rp),
                output_dim=output_dim,
                dtype=dtype,
            )
        return MultiModalCLIP(
            image_encoder=image_encoder,
            dna_encoder=dna_encoder,
            language_encoder=language_encoder,
        )

    if hasattr(mc, "image"):
        if mc.image.input_type == "image":
            image_encoder = ViT(
                ViTConfig(num_classes=output_dim, lora_rank=rank, remat=remat, remat_policy=rp),
                dtype=dtype,
            )
        else:
            image_encoder = MLPEncoder(
                hidden_dim=mc.image.hidden_dim, output_dim=output_dim,
                dtype=dtype,
            )

    if hasattr(mc, "language"):
        if mc.language.input_type == "sequence":
            language_encoder = BertTextEncoder(
                dataclasses.replace(BERT_SMALL_CONFIG, lora_rank=rank, remat=remat, remat_policy=rp),
                output_dim=output_dim,
                dtype=dtype,
            )
        else:
            raise TypeError(
                f"Using {mc.language.input_type} as language input is not "
                "supported yet."
            )

    if hasattr(mc, "dna"):
        if getattr(mc.dna, "freeze", False):
            dna_encoder = IdentityEncoder()
        elif mc.dna.input_type == "sequence":
            dna_encoder = BarcodeBertDnaEncoder(
                dataclasses.replace(BARCODE_BERT_CONFIG, lora_rank=rank, remat=remat, remat_policy=rp),
                output_dim=output_dim,
                dtype=dtype,
            )
        else:
            dna_encoder = MLPEncoder(
                hidden_dim=mc.dna.hidden_dim, output_dim=output_dim,
                dtype=dtype,
            )

    return MultiModalCLIP(
        image_encoder=image_encoder,
        dna_encoder=dna_encoder,
        language_encoder=language_encoder,
    )


def maybe_merge_lora(args, model, params, dtype=jnp.bfloat16):
    """`tpu.merge_lora: true` — fold the LoRA adapters into the projection
    kernels (models/lora.py:merge_lora_params) and rebuild the towers with
    lora_rank=0, so inference runs zero adapter matmuls/slice-updates per
    layer. Call after checkpoint load; returns (model, params) unchanged
    when the knob is off or the model has no adapters."""
    tpu_cfg = getattr(args, "tpu", None)
    if not (tpu_cfg and bool(tpu_cfg.get("merge_lora", False))):
        return model, params
    if bool(getattr(args.model_config, "disable_lora", False)):
        return model, params  # rank already 0, nothing to fold
    from bioscan_clip_tpu.models.lora import merge_lora_params

    return load_clip_model(args, dtype=dtype, lora_rank=0), merge_lora_params(
        params
    )


def init_clip_params(model: MultiModalCLIP, rng, batch_size: int = 2):
    """Initialize parameters with dummy inputs for whichever towers exist."""
    from bioscan_clip_tpu.data.tokenizers import SEQ_LEN

    from bioscan_clip_tpu.models.openclip import (
        OpenClipImageTower,
        OpenClipTextAdapter,
    )

    kwargs = {}
    if model.image_encoder is not None:
        if isinstance(model.image_encoder, (ViT, OpenClipImageTower)):
            s = model.image_encoder.cfg.image_size
            kwargs["image_input"] = jnp.zeros((batch_size, s, s, 3), jnp.float32)
        else:
            kwargs["image_input"] = jnp.zeros((batch_size, 512), jnp.float32)
    if model.dna_encoder is not None:
        if isinstance(model.dna_encoder, BarcodeBertDnaEncoder):
            kwargs["dna_input"] = jnp.zeros((batch_size, SEQ_LEN), jnp.int32)
        else:
            kwargs["dna_input"] = jnp.zeros((batch_size, 768), jnp.float32)
    if model.language_encoder is not None:
        seq = (
            model.language_encoder.cfg.context_length
            if isinstance(model.language_encoder, OpenClipTextAdapter)
            else 20
        )
        ids = jnp.zeros((batch_size, seq), jnp.int32)
        if isinstance(model.language_encoder, OpenClipTextAdapter):
            # EOT pooling needs a nonzero argmax position
            ids = ids.at[:, 1].set(1)
        kwargs["language_input"] = {
            "input_ids": ids,
            "token_type_ids": jnp.zeros((batch_size, seq), jnp.int32),
            "attention_mask": jnp.ones((batch_size, seq), jnp.int32),
        }
    return model.init({"params": rng}, **kwargs, deterministic=True)["params"]
