"""End-to-end MultiModalCLIP tests: factory assembly + full SimpleCLIP-style
checkpoint conversion parity against a composed torch reference.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp
from transformers import BertConfig as HFBertConfig
from transformers import BertForMaskedLM, BertModel

from bioscan_clip_tpu.config.core import load_config
from bioscan_clip_tpu.interop.torch_import import (
    convert_simple_clip_checkpoint,
    merge_params,
)
from bioscan_clip_tpu.models.bert import (
    BarcodeBertDnaEncoder,
    BertConfig,
    BertTextEncoder,
)
from bioscan_clip_tpu.models.clip import (
    MultiModalCLIP,
    init_clip_params,
    load_clip_model,
)
from bioscan_clip_tpu.models.vit import ViT, ViTConfig
from tests.test_bert_parity import _add_lora_torch, _np
from tests.test_vit_parity import _TorchLoRAQkv, _TorchViT


def test_factory_assembles_all_towers():
    cfg = load_config(
        model_config="lora_vit_lora_barcode_bert_lora_bert_ssl",
        project_root_path="/tmp",
    )
    model = load_clip_model(cfg, dtype=jnp.float32)
    assert isinstance(model.image_encoder, ViT)
    assert isinstance(model.dna_encoder, BarcodeBertDnaEncoder)
    assert isinstance(model.language_encoder, BertTextEncoder)
    assert model.image_encoder.cfg.lora_rank == 4
    assert model.dna_encoder.cfg.vocab_size == 1027


def test_factory_disable_lora():
    cfg = load_config(
        model_config="full_fine_tuning/cosin/BIOSCAN_1M_image_dna_cosin_lr_sche",
        project_root_path="/tmp",
    )
    model = load_clip_model(cfg, dtype=jnp.float32)
    assert model.image_encoder.cfg.lora_rank == 0
    assert model.dna_encoder.cfg.lora_rank == 0
    assert model.language_encoder is None  # image+dna config


def test_factory_image_dna_only():
    cfg = load_config(
        model_config="lora_vit_lora_barcode_bert_ssl", project_root_path="/tmp"
    )
    model = load_clip_model(cfg, dtype=jnp.float32)
    assert model.language_encoder is None
    assert model.dna_encoder is not None


def test_full_checkpoint_roundtrip_parity():
    """Compose a reference-layout SimpleCLIP state dict from small torch
    towers, convert, and check all three normalized embeddings match."""
    torch.manual_seed(0)

    # --- torch towers (reference architectures at reduced size) ---
    tvit = _TorchViT(img=32, patch=8, dim=48, depth=2, heads=4, num_classes=32)
    for blk in tvit.blocks:
        blk.attn.qkv = _TorchLoRAQkv(blk.attn.qkv, 48, r=4)
    tvit.eval()

    hf_kw = dict(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, max_position_embeddings=96,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    tdna = BertForMaskedLM(HFBertConfig(vocab_size=1027, **hf_kw)).eval()
    _add_lora_torch(tdna.bert, r=4)
    tdna.cls.predictions.decoder = torch.nn.Linear(64, 32)
    tdna.eval()

    ttxt = BertModel(HFBertConfig(vocab_size=211, **hf_kw)).eval()
    _add_lora_torch(ttxt, r=4)
    tproj = torch.nn.Linear(64, 32)

    # --- reference-layout composite state dict (simple_clip.py:18-26) ---
    sd = {}
    for k, v in tvit.state_dict().items():
        sd[f"image_encoder.lora_vit.{k}"] = _np(v)
    for k, v in tdna.state_dict().items():
        sd[f"dna_encoder.lora_barcode_bert.{k}"] = _np(v)
    for k, v in ttxt.state_dict().items():
        sd[f"language_encoder.lora_bert.{k}"] = _np(v)
    sd["language_encoder.proj.weight"] = _np(tproj.weight)
    sd["language_encoder.proj.bias"] = _np(tproj.bias)

    # --- inputs ---
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    dna_ids = rng.integers(0, 1027, size=(2, 19))
    txt_ids = rng.integers(0, 211, size=(2, 20))
    txt_mask = np.ones((2, 20), dtype=np.int64)
    txt_mask[:, 14:] = 0
    txt_types = np.zeros((2, 20), dtype=np.int64)

    # --- torch reference forward (SimpleCLIP.forward semantics) ---
    with torch.no_grad():
        img_ref = F.normalize(tvit(torch.tensor(imgs)), p=2, dim=-1).numpy()
        dna_ref = F.normalize(
            tdna(input_ids=torch.tensor(dna_ids)).logits.softmax(-1).mean(1),
            p=2, dim=-1,
        ).numpy()
        h = ttxt(
            input_ids=torch.tensor(txt_ids),
            attention_mask=torch.tensor(txt_mask),
            token_type_ids=torch.tensor(txt_types),
        ).last_hidden_state
        txt_ref = F.normalize(tproj(h.mean(1)), p=2, dim=-1).numpy()

    # --- jax model ---
    bert_kw = dict(
        hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
        max_position_embeddings=96, lora_rank=4, hidden_dropout=0.0,
        attention_dropout=0.0,
    )
    model = MultiModalCLIP(
        image_encoder=ViT(
            ViTConfig(
                image_size=32, patch_size=8, hidden_size=48, num_layers=2,
                num_heads=4, num_classes=32, lora_rank=4,
            ),
            dtype=jnp.float32,
        ),
        dna_encoder=BarcodeBertDnaEncoder(
            BertConfig(vocab_size=1027, **bert_kw), output_dim=32,
            dtype=jnp.float32,
        ),
        language_encoder=BertTextEncoder(
            BertConfig(vocab_size=211, **bert_kw), output_dim=32,
            dtype=jnp.float32,
        ),
    )
    x_img = jnp.transpose(jnp.asarray(imgs), (0, 2, 3, 1))
    lang = {
        "input_ids": jnp.asarray(txt_ids),
        "attention_mask": jnp.asarray(txt_mask),
        "token_type_ids": jnp.asarray(txt_types),
    }
    params = model.init(
        jax.random.PRNGKey(0), x_img, jnp.asarray(dna_ids), lang
    )["params"]
    conv = convert_simple_clip_checkpoint(sd, output_dim=32)
    # module names inside MultiModalCLIP
    params = merge_params(
        params,
        {
            "image_encoder": conv["image_encoder"],
            "dna_encoder": conv["dna_encoder"],
            "language_encoder": conv["language_encoder"],
        },
    )
    img_out, dna_out, txt_out = model.apply(
        {"params": params}, x_img, jnp.asarray(dna_ids), lang
    )
    np.testing.assert_allclose(np.asarray(img_out), img_ref, atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dna_out), dna_ref, atol=1e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(txt_out), txt_ref, atol=1e-5, rtol=1e-3)


def test_partial_modalities_forward():
    """None inputs give None outputs (simple_clip.py:27-50)."""
    model = MultiModalCLIP(
        image_encoder=None,
        dna_encoder=BarcodeBertDnaEncoder(
            BertConfig(
                vocab_size=1027, hidden_size=32, num_layers=1, num_heads=2,
                intermediate_size=64, lora_rank=0, hidden_dropout=0.0,
                attention_dropout=0.0,
            ),
            output_dim=16,
            dtype=jnp.float32,
        ),
        language_encoder=None,
    )
    ids = jnp.zeros((2, 9), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dna_input=ids)["params"]
    img, dna, txt = model.apply({"params": params}, dna_input=ids)
    assert img is None and txt is None
    assert dna.shape == (2, 16)
    norms = jnp.linalg.norm(dna, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-6)
