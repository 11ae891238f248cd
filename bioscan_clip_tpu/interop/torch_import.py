"""PyTorch checkpoint -> JAX parameter-tree converters.

Supported source layouts (all used by the reference):
1. **BarcodeBERT MLM checkpoint** (`ckpt/BarcodeBERT/5_mer/model_41.pth`): a
   `BertForMaskedLM(vocab=1027)` state dict, possibly with DDP `module.`
   prefixes (reference strips them: bioscanclip/util/util.py:72-84). Its MLM
   decoder is *discarded* — the reference replaces it with a fresh
   Linear(768, output_dim) (dna_encoder.py:93-95).
2. **HF BertModel state dict** (prajjwal1/bert-small) for the text tower.
3. **timm ViT state dict** (`vit_base_patch16_224`) for the image tower;
   its 1000-class head is discarded (reset_classifier(768),
   image_encoder.py:94-95).
4. **Released SimpleCLIP .pth** checkpoints (README.md:32-39): the composite
   state dict with LoRA-wrapped key names — `blocks.{i}.attn.qkv.qkv.weight`
   + `linear_{a,b}_{q,v}` for the ViT (image_encoder.py:25-48) and
   `attention.self.{query,value}.{w,w_a,w_b}.weight` for the BERTs
   (dna_encoder.py:40-49) — as well as the unwrapped names when the model
   was built with `disable_lora` (lora_layer=[]).

Conventions: torch Linear stores (out, in); flax Dense kernels are (in, out)
-> transpose. Conv2d (O,I,kH,kW) -> flax (kH,kW,I,O). Layers under nn.scan
stack per-layer tensors on axis 0.

Everything here operates on plain numpy dicts; torch is only used to
deserialize .pth files.
"""

from __future__ import annotations

import re

import numpy as np


# --------------------------------------------------------------------------
# Loading / generic helpers
# --------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> dict:
    """Deserialize a .pth into {key: np.ndarray}, stripping `module.`
    prefixes (util.py:72-84)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _t(x):  # torch Linear weight -> flax kernel
    return np.ascontiguousarray(np.asarray(x).T)


def _sub(sd: dict, prefix: str) -> dict:
    """Select keys under a prefix, prefix removed."""
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def _stack(per_layer: list) -> np.ndarray:
    return np.stack(per_layer, axis=0)


def merge_params(init_params, converted):
    """Overlay converted leaves onto an init param tree (fresh leaves — e.g.
    the ViT head or the replaced DNA decoder when loading raw pretrained
    towers — stay from init). Shapes must match where both exist."""
    import jax

    def _merge(a, b):
        if isinstance(a, dict):
            out = dict(a)
            for k, v in (b or {}).items():
                out[k] = _merge(a[k], v) if k in a else v
            return out
        if b is None:
            return a
        b = np.asarray(b)
        if tuple(a.shape) != tuple(b.shape):
            raise ValueError(
                f"shape mismatch in merge: init {a.shape} vs ckpt {b.shape}"
            )
        return b.astype(np.asarray(a).dtype)

    return _merge(init_params, converted)


# --------------------------------------------------------------------------
# BERT towers
# --------------------------------------------------------------------------

def _linear_maybe_lora(layer_sd: dict, name: str):
    """Return (kernel, bias, lora_a, lora_b) for an attention projection that
    may be LoRA-wrapped (`{name}.w.weight` + `{name}.w_a/w_b.weight`,
    dna_encoder.py:40-49) or plain (`{name}.weight`)."""
    if f"{name}.w.weight" in layer_sd:
        k = _t(layer_sd[f"{name}.w.weight"])
        b = layer_sd[f"{name}.w.bias"]
        a_ = _t(layer_sd[f"{name}.w_a.weight"])  # (d, r)
        b_ = _t(layer_sd[f"{name}.w_b.weight"])  # (r, d)
        return k, b, a_, b_
    k = _t(layer_sd[f"{name}.weight"])
    b = layer_sd[f"{name}.bias"]
    return k, b, None, None


def convert_bert_encoder(sd: dict, num_layers: int) -> dict:
    """HF BertModel-layout state dict (no `bert.` prefix) -> BertEncoder
    params for our stacked-scan layout."""
    emb = _sub(sd, "embeddings.")
    params = {
        "word_embeddings": {"embedding": emb["word_embeddings.weight"]},
        "position_embeddings": {"embedding": emb["position_embeddings.weight"]},
        "token_type_embeddings": {
            "embedding": emb["token_type_embeddings.weight"]
        },
        "emb_ln": {
            "scale": emb["LayerNorm.weight"],
            "bias": emb["LayerNorm.bias"],
        },
    }

    cols = {
        "query": {"kernel": [], "bias": []},
        "key": {"kernel": [], "bias": []},
        "value": {"kernel": [], "bias": []},
        "attn_out": {"kernel": [], "bias": []},
        "attn_ln": {"scale": [], "bias": []},
        "inter": {"kernel": [], "bias": []},
        "out": {"kernel": [], "bias": []},
        "out_ln": {"scale": [], "bias": []},
    }
    lora = {"lora_q_a": [], "lora_q_b": [], "lora_v_a": [], "lora_v_b": []}
    has_lora = False

    for i in range(num_layers):
        L = _sub(sd, f"encoder.layer.{i}.")
        qk, qb, qa, qB = _linear_maybe_lora(L, "attention.self.query")
        vk, vb, va, vB = _linear_maybe_lora(L, "attention.self.value")
        cols["query"]["kernel"].append(qk)
        cols["query"]["bias"].append(qb)
        cols["value"]["kernel"].append(vk)
        cols["value"]["bias"].append(vb)
        cols["key"]["kernel"].append(_t(L["attention.self.key.weight"]))
        cols["key"]["bias"].append(L["attention.self.key.bias"])
        cols["attn_out"]["kernel"].append(_t(L["attention.output.dense.weight"]))
        cols["attn_out"]["bias"].append(L["attention.output.dense.bias"])
        cols["attn_ln"]["scale"].append(L["attention.output.LayerNorm.weight"])
        cols["attn_ln"]["bias"].append(L["attention.output.LayerNorm.bias"])
        cols["inter"]["kernel"].append(_t(L["intermediate.dense.weight"]))
        cols["inter"]["bias"].append(L["intermediate.dense.bias"])
        cols["out"]["kernel"].append(_t(L["output.dense.weight"]))
        cols["out"]["bias"].append(L["output.dense.bias"])
        cols["out_ln"]["scale"].append(L["output.LayerNorm.weight"])
        cols["out_ln"]["bias"].append(L["output.LayerNorm.bias"])
        if qa is not None:
            has_lora = True
            lora["lora_q_a"].append(qa)
            lora["lora_q_b"].append(qB)
            lora["lora_v_a"].append(va)
            lora["lora_v_b"].append(vB)

    layers = {
        name: {k: _stack(v) for k, v in sub.items()}
        for name, sub in cols.items()
    }
    if has_lora:
        for k, v in lora.items():
            layers[k] = _stack(v)
    params["layers"] = layers
    return params


def convert_barcode_bert(sd: dict, num_layers: int = 12) -> dict:
    """BarcodeBERT (BertForMaskedLM layout, `bert.`-prefixed) -> params for
    BarcodeBertDnaEncoder, *excluding* the decoder: the reference replaces
    the MLM decoder with a fresh Linear (dna_encoder.py:93-95), so the
    vocab-sized pretrained decoder is intentionally dropped.

    If the state dict contains a replaced square decoder (from a SimpleCLIP
    checkpoint), it IS converted.
    """
    out = {"bert": convert_bert_encoder(_sub(sd, "bert."), num_layers)}
    tr = _sub(sd, "cls.predictions.transform.")
    if tr:
        out["transform_dense"] = {
            "kernel": _t(tr["dense.weight"]),
            "bias": tr["dense.bias"],
        }
        out["transform_ln"] = {
            "scale": tr["LayerNorm.weight"],
            "bias": tr["LayerNorm.bias"],
        }
    dec_w = sd.get("cls.predictions.decoder.weight")
    if dec_w is not None:
        vocab = sd["bert.embeddings.word_embeddings.weight"].shape[0]
        # A vocab-sized decoder is the *pretrained MLM* decoder, which the
        # reference throws away (dna_encoder.py:93-95); anything else is the
        # replaced projection from a SimpleCLIP checkpoint — keep it.
        if dec_w.shape[0] != vocab:
            out["decoder"] = {
                "kernel": _t(dec_w),
                "bias": sd["cls.predictions.decoder.bias"],
            }
    return out


def convert_text_encoder(sd: dict, num_layers: int = 4) -> dict:
    """BertModel (or LoRA_bert from a SimpleCLIP ckpt) -> BertTextEncoder
    params. The `proj` head only exists in SimpleCLIP checkpoints."""
    # In SimpleCLIP ckpts the tower lives under `lora_bert.`; raw HF dicts
    # have no prefix.
    inner = _sub(sd, "lora_bert.") if any(
        k.startswith("lora_bert.") for k in sd
    ) else sd
    out = {"bert": convert_bert_encoder(inner, num_layers)}
    if "proj.weight" in sd:
        out["proj"] = {"kernel": _t(sd["proj.weight"]), "bias": sd["proj.bias"]}
    return out


# --------------------------------------------------------------------------
# ViT tower
# --------------------------------------------------------------------------

def convert_timm_vit(
    sd: dict, num_layers: int = 12, head_out: int = 768
) -> dict:
    """timm `vit_base_patch16_224` state dict (or the LoRA-wrapped variant
    inside SimpleCLIP ckpts, under `lora_vit.`) -> ViT params.

    The `head` is converted only when its out-dim equals `head_out` (the
    model's output_dim): timm's pretrained 1000-class head is dropped —
    the reference resets it (image_encoder.py:94-95) — while a SimpleCLIP
    checkpoint's 768-out head is loaded.
    """
    if any(k.startswith("lora_vit.") for k in sd):
        sd = _sub(sd, "lora_vit.")

    params = {
        "patch_embed": {
            # (O, I, kH, kW) -> (kH, kW, I, O)
            "kernel": np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)),
            "bias": sd["patch_embed.proj.bias"],
        },
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }

    cols = {
        "norm1": {"scale": [], "bias": []},
        "qkv": {"kernel": [], "bias": []},
        "proj": {"kernel": [], "bias": []},
        "norm2": {"scale": [], "bias": []},
        "fc1": {"kernel": [], "bias": []},
        "fc2": {"kernel": [], "bias": []},
    }
    lora = {"lora_q_a": [], "lora_q_b": [], "lora_v_a": [], "lora_v_b": []}
    has_lora = False

    for i in range(num_layers):
        L = _sub(sd, f"blocks.{i}.")
        cols["norm1"]["scale"].append(L["norm1.weight"])
        cols["norm1"]["bias"].append(L["norm1.bias"])
        # plain timm: attn.qkv.weight; LoRA-wrapped: attn.qkv.qkv.weight
        if "attn.qkv.qkv.weight" in L:
            cols["qkv"]["kernel"].append(_t(L["attn.qkv.qkv.weight"]))
            cols["qkv"]["bias"].append(L["attn.qkv.qkv.bias"])
            has_lora = True
            lora["lora_q_a"].append(_t(L["attn.qkv.linear_a_q.weight"]))
            lora["lora_q_b"].append(_t(L["attn.qkv.linear_b_q.weight"]))
            lora["lora_v_a"].append(_t(L["attn.qkv.linear_a_v.weight"]))
            lora["lora_v_b"].append(_t(L["attn.qkv.linear_b_v.weight"]))
        else:
            cols["qkv"]["kernel"].append(_t(L["attn.qkv.weight"]))
            cols["qkv"]["bias"].append(L["attn.qkv.bias"])
        cols["proj"]["kernel"].append(_t(L["attn.proj.weight"]))
        cols["proj"]["bias"].append(L["attn.proj.bias"])
        cols["norm2"]["scale"].append(L["norm2.weight"])
        cols["norm2"]["bias"].append(L["norm2.bias"])
        cols["fc1"]["kernel"].append(_t(L["mlp.fc1.weight"]))
        cols["fc1"]["bias"].append(L["mlp.fc1.bias"])
        cols["fc2"]["kernel"].append(_t(L["mlp.fc2.weight"]))
        cols["fc2"]["bias"].append(L["mlp.fc2.bias"])

    blocks = {
        name: {k: _stack(v) for k, v in sub.items()}
        for name, sub in cols.items()
    }
    if has_lora:
        for k, v in lora.items():
            blocks[k] = _stack(v)
    params["blocks"] = blocks

    head_w = sd.get("head.weight")
    if head_w is not None and head_w.shape[0] == head_out:
        params["head"] = {"kernel": _t(head_w), "bias": sd["head.bias"]}
    return params


# --------------------------------------------------------------------------
# Full SimpleCLIP checkpoints
# --------------------------------------------------------------------------

def convert_simple_clip_checkpoint(sd: dict, output_dim: int = 768) -> dict:
    """Released SimpleCLIP .pth -> {image_encoder, dna_encoder,
    language_encoder} converted subtrees (only those present in the ckpt).

    Reference key roots: `image_encoder.lora_vit.*`,
    `dna_encoder.lora_barcode_bert.*` (+ per-layer LoRA wraps),
    `language_encoder.lora_bert.*` + `language_encoder.proj.*`
    (simple_clip.py:18-26 attribute names). `for_open_clip` checkpoints
    instead carry the whole model under `open_clip_model.*`
    (simple_clip.py:24), possibly with loratorch LoRA adapters on every
    `attn` (util.py:309-359) — both towers are converted from that root.
    """
    out = {}
    oc = _sub(sd, "open_clip_model.")
    if oc:
        from bioscan_clip_tpu.models.openclip import (
            convert_openclip_text,
            convert_openclip_visual,
        )

        nl_v = _count_layers(oc, r"visual\.transformer\.resblocks\.(\d+)\.")
        out["image_encoder"] = convert_openclip_visual(oc, layers=nl_v)
        nl_t = _count_layers(oc, r"transformer\.resblocks\.(\d+)\.")
        out["language_encoder"] = {
            "text": convert_openclip_text(oc, layers=nl_t)
        }
    img = _sub(sd, "image_encoder.")
    if img:
        nl = _count_layers(img, r"(?:lora_vit\.)?blocks\.(\d+)\.")
        out["image_encoder"] = convert_timm_vit(
            img, num_layers=nl, head_out=output_dim
        )
    dna = _sub(sd, "dna_encoder.")
    if dna:
        inner = _sub(dna, "lora_barcode_bert.") if any(
            k.startswith("lora_barcode_bert.") for k in dna
        ) else dna
        nl = _count_layers(inner, r"bert\.encoder\.layer\.(\d+)\.")
        out["dna_encoder"] = convert_barcode_bert(inner, num_layers=nl)
    txt = _sub(sd, "language_encoder.")
    if txt:
        nl = _count_layers(txt, r"(?:lora_bert\.)?encoder\.layer\.(\d+)\.")
        out["language_encoder"] = convert_text_encoder(txt, num_layers=nl)
    return out


def _count_layers(sd: dict, pattern: str) -> int:
    rx = re.compile(pattern)
    idx = {int(m.group(1)) for k in sd for m in [rx.match(k)] if m}
    if not idx:
        raise ValueError(f"no layers matching {pattern!r} in checkpoint")
    return max(idx) + 1
