"""JAX parameter tree -> reference-layout torch state dict (the reverse of
torch_import), so checkpoints trained here can be handed back to the PyTorch
ecosystem (the reference's scripts, BZSL tooling, released-ckpt consumers).

Key naming mirrors the LoRA-wrapped SimpleCLIP layout when LoRA params are
present (`blocks.{i}.attn.qkv.qkv.weight` + `linear_{a,b}_{q,v}`,
`attention.self.{query,value}.{w,w_a,w_b}`) and the plain layout otherwise —
exactly what torch_import.convert_simple_clip_checkpoint consumes, giving a
lossless round trip.
"""

from __future__ import annotations

import numpy as np


def _t(x):
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32).T)


def _np(x):
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def export_vit(params: dict, prefix: str = "image_encoder.lora_vit.") -> dict:
    sd = {}
    sd[prefix + "patch_embed.proj.weight"] = np.transpose(
        _np(params["patch_embed"]["kernel"]), (3, 2, 0, 1)
    )
    sd[prefix + "patch_embed.proj.bias"] = _np(params["patch_embed"]["bias"])
    sd[prefix + "cls_token"] = _np(params["cls_token"])
    sd[prefix + "pos_embed"] = _np(params["pos_embed"])
    sd[prefix + "norm.weight"] = _np(params["norm"]["scale"])
    sd[prefix + "norm.bias"] = _np(params["norm"]["bias"])
    if "head" in params:
        sd[prefix + "head.weight"] = _t(params["head"]["kernel"])
        sd[prefix + "head.bias"] = _np(params["head"]["bias"])

    blocks = params["blocks"]
    has_lora = "lora_q_a" in blocks
    n = blocks["norm1"]["scale"].shape[0]
    for i in range(n):
        P = prefix + f"blocks.{i}."
        sd[P + "norm1.weight"] = _np(blocks["norm1"]["scale"][i])
        sd[P + "norm1.bias"] = _np(blocks["norm1"]["bias"][i])
        qkv_k = _t(blocks["qkv"]["kernel"][i])
        qkv_b = _np(blocks["qkv"]["bias"][i])
        if has_lora:
            sd[P + "attn.qkv.qkv.weight"] = qkv_k
            sd[P + "attn.qkv.qkv.bias"] = qkv_b
            sd[P + "attn.qkv.linear_a_q.weight"] = _t(blocks["lora_q_a"][i])
            sd[P + "attn.qkv.linear_b_q.weight"] = _t(blocks["lora_q_b"][i])
            sd[P + "attn.qkv.linear_a_v.weight"] = _t(blocks["lora_v_a"][i])
            sd[P + "attn.qkv.linear_b_v.weight"] = _t(blocks["lora_v_b"][i])
        else:
            sd[P + "attn.qkv.weight"] = qkv_k
            sd[P + "attn.qkv.bias"] = qkv_b
        sd[P + "attn.proj.weight"] = _t(blocks["proj"]["kernel"][i])
        sd[P + "attn.proj.bias"] = _np(blocks["proj"]["bias"][i])
        sd[P + "norm2.weight"] = _np(blocks["norm2"]["scale"][i])
        sd[P + "norm2.bias"] = _np(blocks["norm2"]["bias"][i])
        sd[P + "mlp.fc1.weight"] = _t(blocks["fc1"]["kernel"][i])
        sd[P + "mlp.fc1.bias"] = _np(blocks["fc1"]["bias"][i])
        sd[P + "mlp.fc2.weight"] = _t(blocks["fc2"]["kernel"][i])
        sd[P + "mlp.fc2.bias"] = _np(blocks["fc2"]["bias"][i])
    return sd


def export_bert_encoder(params: dict, prefix: str) -> dict:
    sd = {}
    sd[prefix + "embeddings.word_embeddings.weight"] = _np(
        params["word_embeddings"]["embedding"]
    )
    sd[prefix + "embeddings.position_embeddings.weight"] = _np(
        params["position_embeddings"]["embedding"]
    )
    sd[prefix + "embeddings.token_type_embeddings.weight"] = _np(
        params["token_type_embeddings"]["embedding"]
    )
    sd[prefix + "embeddings.LayerNorm.weight"] = _np(params["emb_ln"]["scale"])
    sd[prefix + "embeddings.LayerNorm.bias"] = _np(params["emb_ln"]["bias"])

    L = params["layers"]
    has_lora = "lora_q_a" in L
    n = L["query"]["kernel"].shape[0]
    for i in range(n):
        P = prefix + f"encoder.layer.{i}."
        if has_lora:
            sd[P + "attention.self.query.w.weight"] = _t(L["query"]["kernel"][i])
            sd[P + "attention.self.query.w.bias"] = _np(L["query"]["bias"][i])
            sd[P + "attention.self.query.w_a.weight"] = _t(L["lora_q_a"][i])
            sd[P + "attention.self.query.w_b.weight"] = _t(L["lora_q_b"][i])
            sd[P + "attention.self.value.w.weight"] = _t(L["value"]["kernel"][i])
            sd[P + "attention.self.value.w.bias"] = _np(L["value"]["bias"][i])
            sd[P + "attention.self.value.w_a.weight"] = _t(L["lora_v_a"][i])
            sd[P + "attention.self.value.w_b.weight"] = _t(L["lora_v_b"][i])
        else:
            sd[P + "attention.self.query.weight"] = _t(L["query"]["kernel"][i])
            sd[P + "attention.self.query.bias"] = _np(L["query"]["bias"][i])
            sd[P + "attention.self.value.weight"] = _t(L["value"]["kernel"][i])
            sd[P + "attention.self.value.bias"] = _np(L["value"]["bias"][i])
        sd[P + "attention.self.key.weight"] = _t(L["key"]["kernel"][i])
        sd[P + "attention.self.key.bias"] = _np(L["key"]["bias"][i])
        sd[P + "attention.output.dense.weight"] = _t(L["attn_out"]["kernel"][i])
        sd[P + "attention.output.dense.bias"] = _np(L["attn_out"]["bias"][i])
        sd[P + "attention.output.LayerNorm.weight"] = _np(L["attn_ln"]["scale"][i])
        sd[P + "attention.output.LayerNorm.bias"] = _np(L["attn_ln"]["bias"][i])
        sd[P + "intermediate.dense.weight"] = _t(L["inter"]["kernel"][i])
        sd[P + "intermediate.dense.bias"] = _np(L["inter"]["bias"][i])
        sd[P + "output.dense.weight"] = _t(L["out"]["kernel"][i])
        sd[P + "output.dense.bias"] = _np(L["out"]["bias"][i])
        sd[P + "output.LayerNorm.weight"] = _np(L["out_ln"]["scale"][i])
        sd[P + "output.LayerNorm.bias"] = _np(L["out_ln"]["bias"][i])
    return sd


def export_simple_clip(params: dict) -> dict:
    """MultiModalCLIP params -> reference SimpleCLIP state-dict layout."""
    sd = {}
    if "image_encoder" in params:
        sd.update(export_vit(params["image_encoder"]))
    if "dna_encoder" in params:
        d = params["dna_encoder"]
        pre = "dna_encoder.lora_barcode_bert."
        sd.update(export_bert_encoder(d["bert"], pre + "bert."))
        sd[pre + "cls.predictions.transform.dense.weight"] = _t(
            d["transform_dense"]["kernel"]
        )
        sd[pre + "cls.predictions.transform.dense.bias"] = _np(
            d["transform_dense"]["bias"]
        )
        sd[pre + "cls.predictions.transform.LayerNorm.weight"] = _np(
            d["transform_ln"]["scale"]
        )
        sd[pre + "cls.predictions.transform.LayerNorm.bias"] = _np(
            d["transform_ln"]["bias"]
        )
        sd[pre + "cls.predictions.decoder.weight"] = _t(d["decoder"]["kernel"])
        sd[pre + "cls.predictions.decoder.bias"] = _np(d["decoder"]["bias"])
    if "language_encoder" in params:
        t = params["language_encoder"]
        sd.update(
            export_bert_encoder(t["bert"], "language_encoder.lora_bert.")
        )
        sd["language_encoder.proj.weight"] = _t(t["proj"]["kernel"])
        sd["language_encoder.proj.bias"] = _np(t["proj"]["bias"])
    return sd


def save_pth(params: dict, path: str):
    """Write a torch-loadable .pth of the reference-layout state dict."""
    import torch

    sd = {k: torch.tensor(v) for k, v in export_simple_clip(params).items()}
    torch.save(sd, path)
    return path
