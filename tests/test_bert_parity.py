"""Bit-faithfulness tests: HF torch BERT vs Flax BertEncoder via converters.

The torch side is constructed locally (no network) with transformers'
BertModel/BertForMaskedLM — the exact classes the reference uses
(dna_encoder.py:19-20, language_encoder.py:15) — so agreement here transfers
to the released checkpoints.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from transformers import BertConfig as HFBertConfig
from transformers import BertForMaskedLM, BertModel

from bioscan_clip_tpu.interop.torch_import import (
    convert_barcode_bert,
    convert_bert_encoder,
    convert_text_encoder,
    merge_params,
)
from bioscan_clip_tpu.models.bert import (
    BarcodeBertDnaEncoder,
    BertConfig,
    BertEncoder,
    BertTextEncoder,
)

SMALL_HF = dict(
    vocab_size=211,
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=96,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
)
SMALL_JX = BertConfig(
    vocab_size=211,
    hidden_size=64,
    num_layers=3,
    num_heads=4,
    intermediate_size=128,
    max_position_embeddings=96,
    lora_rank=0,
    hidden_dropout=0.0,
    attention_dropout=0.0,
)


def _np(x):
    return x.detach().cpu().numpy()


def test_bert_encoder_parity():
    torch.manual_seed(0)
    hf = BertModel(HFBertConfig(**SMALL_HF)).eval()
    sd = {k: _np(v) for k, v in hf.state_dict().items()}

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 211, size=(4, 20))
    mask = np.ones((4, 20), dtype=np.int64)
    mask[0, 15:] = 0
    mask[2, 5:] = 0
    types = rng.integers(0, 2, size=(4, 20))

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(types),
        ).last_hidden_state.numpy()

    model = BertEncoder(SMALL_JX, dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(types),
    )["params"]
    params = merge_params(params, convert_bert_encoder(sd, num_layers=3))
    out = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(types),
    )
    # Positions attended to must match closely; padded positions are
    # influenced only by mask handling, compare them too (HF computes them).
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


class _TorchLoRALayer(torch.nn.Module):
    """Reference _LoRALayer semantics (dna_encoder.py:40-49): w(x)+w_b(w_a(x))."""

    def __init__(self, w, dim, r):
        super().__init__()
        self.w = w
        self.w_a = torch.nn.Linear(dim, r, bias=False)
        self.w_b = torch.nn.Linear(r, dim, bias=False)
        torch.nn.init.normal_(self.w_a.weight, std=0.2)
        torch.nn.init.normal_(self.w_b.weight, std=0.2)  # nonzero: test the path

    def forward(self, x):
        return self.w(x) + self.w_b(self.w_a(x))


def _add_lora_torch(bert, r=4):
    for layer in bert.encoder.layer:
        dim = layer.attention.self.query.in_features
        layer.attention.self.query = _TorchLoRALayer(
            layer.attention.self.query, dim, r
        )
        layer.attention.self.value = _TorchLoRALayer(
            layer.attention.self.value, dim, r
        )


def test_barcode_bert_dna_encoder_parity_with_lora():
    """Full DNA tower: LoRA-wrapped BarcodeBERT + replaced decoder +
    softmax-of-logits mean pooling (dna_encoder.py:103-105)."""
    torch.manual_seed(1)
    cfg = HFBertConfig(**{**SMALL_HF, "vocab_size": 1027})
    mlm = BertForMaskedLM(cfg).eval()
    _add_lora_torch(mlm.bert, r=4)
    # reference replaces the decoder with Linear(d, output_dim)
    mlm.cls.predictions.decoder = torch.nn.Linear(64, 48)
    mlm.eval()

    rng = np.random.default_rng(2)
    ids = rng.integers(0, 1027, size=(3, 17))
    with torch.no_grad():
        logits = mlm(input_ids=torch.tensor(ids)).logits
        ref = logits.softmax(dim=-1).mean(dim=1).numpy()

    sd = {k: _np(v) for k, v in mlm.state_dict().items()}
    jcfg = BertConfig(
        vocab_size=1027, hidden_size=64, num_layers=3, num_heads=4,
        intermediate_size=128, max_position_embeddings=96, lora_rank=4,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    model = BarcodeBertDnaEncoder(jcfg, output_dim=48, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    params = merge_params(params, convert_barcode_bert(sd, num_layers=3))
    out = model.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6, rtol=1e-4)


def test_text_encoder_parity_with_lora():
    """Text tower: LoRA BERT-small + mean over ALL tokens + proj
    (language_encoder.py:87-89)."""
    torch.manual_seed(2)
    hf = BertModel(HFBertConfig(**SMALL_HF)).eval()
    _add_lora_torch(hf, r=4)
    proj = torch.nn.Linear(64, 48)
    hf.eval()

    rng = np.random.default_rng(3)
    ids = rng.integers(0, 211, size=(5, 20))
    mask = np.ones((5, 20), dtype=np.int64)
    mask[:, 12:] = 0
    types = np.zeros((5, 20), dtype=np.int64)

    with torch.no_grad():
        h = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(types),
        ).last_hidden_state
        ref = proj(h.mean(dim=1)).numpy()

    sd = {f"lora_bert.{k}": _np(v) for k, v in hf.state_dict().items()}
    sd["proj.weight"] = _np(proj.weight)
    sd["proj.bias"] = _np(proj.bias)

    jcfg = BertConfig(
        vocab_size=211, hidden_size=64, num_layers=3, num_heads=4,
        intermediate_size=128, max_position_embeddings=96, lora_rank=4,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    model = BertTextEncoder(jcfg, output_dim=48, dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(types),
    )["params"]
    params = merge_params(params, convert_text_encoder(sd, num_layers=3))
    out = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(types),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-6, rtol=1e-4)
