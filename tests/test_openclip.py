"""OpenCLIP-geometry tower parity vs a torch reference (open_clip module
layout re-implemented at reduced size, state-dict keys matching open_clip
naming so the converter is exercised end-to-end)."""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from bioscan_clip_tpu.models.openclip import (
    OpenClipImageTower,
    OpenClipTextTower,
    OpenClipTextConfig,
    OpenClipVisionConfig,
    convert_openclip_text,
    convert_openclip_visual,
)
from bioscan_clip_tpu.interop.torch_import import merge_params


class _Block(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(d, eps=1e-5)
        self.attn = tnn.MultiheadAttention(d, h, batch_first=True)
        self.ln_2 = tnn.LayerNorm(d, eps=1e-5)
        self.mlp = tnn.Sequential()
        self.mlp.c_fc = tnn.Linear(d, 4 * d)
        self.mlp.gelu = tnn.GELU()
        self.mlp.c_proj = tnn.Linear(4 * d, d)

    def forward(self, x, mask=None):
        y = self.ln_1(x)
        y, _ = self.attn(y, y, y, need_weights=False, attn_mask=mask)
        x = x + y
        x = x + self.mlp.c_proj(self.mlp.gelu(self.mlp.c_fc(self.ln_2(x))))
        return x


class _Visual(tnn.Module):
    def __init__(self, img=28, patch=14, d=32, layers=2, heads=4, out=24):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, d, patch, stride=patch, bias=False)
        n = (img // patch) ** 2
        self.class_embedding = tnn.Parameter(torch.randn(d) * 0.02)
        self.positional_embedding = tnn.Parameter(torch.randn(n + 1, d) * 0.02)
        self.ln_pre = tnn.LayerNorm(d, eps=1e-5)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [_Block(d, heads) for _ in range(layers)]
        )
        self.ln_post = tnn.LayerNorm(d, eps=1e-5)
        self.proj = tnn.Parameter(torch.randn(d, out) * d**-0.5)

    def forward(self, x):
        x = self.conv1(x).flatten(2).transpose(1, 2)
        x = torch.cat(
            [self.class_embedding.expand(x.shape[0], 1, -1), x], dim=1
        )
        x = x + self.positional_embedding
        x = self.ln_pre(x)
        for blk in self.transformer.resblocks:
            x = blk(x)
        return self.ln_post(x[:, 0]) @ self.proj


class _Text(tnn.Module):
    def __init__(self, vocab=97, ctx=16, d=32, layers=2, heads=4, out=24):
        super().__init__()
        self.token_embedding = tnn.Embedding(vocab, d)
        self.positional_embedding = tnn.Parameter(torch.randn(ctx, d) * 0.01)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [_Block(d, heads) for _ in range(layers)]
        )
        self.ln_final = tnn.LayerNorm(d, eps=1e-5)
        self.text_projection = tnn.Parameter(torch.randn(d, out) * d**-0.5)
        mask = torch.full((ctx, ctx), float("-inf")).triu(1)
        self.register_buffer("mask", mask, persistent=False)

    def forward(self, ids):
        x = self.token_embedding(ids) + self.positional_embedding
        for blk in self.transformer.resblocks:
            x = blk(x, mask=self.mask)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), ids.argmax(dim=-1)]
        return pooled @ self.text_projection


def test_visual_tower_parity():
    torch.manual_seed(0)
    tv = _Visual().eval()
    sd = {f"visual.{k}": v.detach().numpy() for k, v in tv.state_dict().items()}
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = tv(torch.tensor(imgs)).numpy()
    cfg = OpenClipVisionConfig(
        image_size=28, patch_size=14, width=32, layers=2, heads=4,
        output_dim=24, lora_rank=0,
    )
    model = OpenClipImageTower(cfg, dtype=jnp.float32)
    x = jnp.transpose(jnp.asarray(imgs), (0, 2, 3, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    params = merge_params(params, convert_openclip_visual(sd, layers=2))
    out = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-3)


def test_text_tower_parity():
    torch.manual_seed(1)
    tt = _Text().eval()
    sd = {k: v.detach().numpy() for k, v in tt.state_dict().items()}
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 90, size=(3, 16))
    ids[:, 0] = 1
    ids[0, 7] = 96  # EOT-like max token mid-sequence
    ids[1, 15] = 96
    ids[2, 3] = 96
    with torch.no_grad():
        ref = tt(torch.tensor(ids)).numpy()
    cfg = OpenClipTextConfig(
        context_length=16, vocab_size=97, width=32, layers=2, heads=4,
        output_dim=24, lora_rank=0,
    )
    model = OpenClipTextTower(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    params = merge_params(params, convert_openclip_text(sd, layers=2))
    out = model.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-3)


def test_factory_openclip_path():
    from bioscan_clip_tpu.config.core import load_config
    from bioscan_clip_tpu.models.clip import load_clip_model
    from bioscan_clip_tpu.models.openclip import OpenClipImageTower

    cfg = load_config(
        model_config=(
            "ablation_with_open_clip/"
            "trained_with_bioscan_1m_image_dna_text_with_pretrained_clip"
        ),
        project_root_path="/tmp",
    )
    model = load_clip_model(cfg, dtype=jnp.float32)
    assert isinstance(model.image_encoder, OpenClipImageTower)
    assert model.image_encoder.cfg.width == 1024
    assert model.image_encoder.cfg.layers == 24
    assert model.dna_encoder is not None
    assert model.language_encoder.cfg.vocab_size == 49408


def test_clip_tokenizer_with_synthetic_bpe(tmp_path):
    """Exercise the BPE machinery with a tiny merges file."""
    from bioscan_clip_tpu.data.clip_tokenizer import ClipTokenizer

    merges = "#version tiny\nd i\np t</w>\ndi pt</w>\ne r\na er</w>\n"
    p = tmp_path / "bpe.txt"
    p.write_text(merges)
    tok = ClipTokenizer(bpe_path=str(p))
    out = tok(["Diptera dipt", ""], context_length=12)
    assert out.shape == (2, 12)
    sot = tok.encoder[tok.SOT]
    eot = tok.encoder[tok.EOT]
    assert out[0, 0] == sot
    assert eot in out[0]
    assert out[1, 0] == sot and out[1, 1] == eot
    # merged token "dipt</w>" must be used for the standalone word "dipt"
    assert tok.encoder["dipt</w>"] in out[0]


def test_clip_tokenizer_missing_bpe():
    from bioscan_clip_tpu.data.clip_tokenizer import ClipTokenizer

    with pytest.raises(FileNotFoundError):
        ClipTokenizer(bpe_path="/nonexistent/bpe.gz")


def _attach_synthetic_loratorch(model, root, r=4, alpha=1.0, seed=7):
    """Add loratorch-layout `{q,k,v}_lora_{A,B}` entries to `model`'s state
    dict copy AND merge the scaled deltas into the live module's in_proj
    weights (loratorch evaluates with W' = W + alpha/r * B @ A), so the
    torch forward is the LoRA-adapted reference output."""
    torch.manual_seed(seed)
    sd = {f"{root}.{k}": v.detach().numpy().copy()
          for k, v in model.state_dict().items()}
    for i, blk in enumerate(model.transformer.resblocks):
        d = blk.attn.embed_dim
        for si, s in enumerate("qkv"):
            A = torch.randn(r, d) * 0.3
            B = torch.randn(d, r) * 0.3
            key = f"{root}.transformer.resblocks.{i}.attn.{s}"
            sd[f"{key}_lora_A"] = A.numpy()
            sd[f"{key}_lora_B"] = B.numpy()
            with torch.no_grad():
                blk.attn.in_proj_weight[si * d:(si + 1) * d] += (
                    (alpha / r) * (B @ A)
                )
    return sd


def test_visual_tower_parity_with_loratorch_checkpoint():
    """Released `for_open_clip` checkpoints wrap every attn in loratorch
    MultiheadAttention(enable_lora=['q','k','v'], r=4) (util.py:309-359);
    the converter must map its per-slot A/B params (scaling folded into B)
    so our unmerged LoRA forward equals torch's merged-weight forward."""
    torch.manual_seed(6)
    tv = _Visual()
    tv.eval()
    sd = _attach_synthetic_loratorch(tv, "visual")

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = tv(torch.tensor(imgs)).numpy()

    cfg = OpenClipVisionConfig(
        image_size=28, patch_size=14, width=32, layers=2, heads=4,
        output_dim=24, lora_rank=4,
    )
    model = OpenClipImageTower(cfg, dtype=jnp.float32)
    x = jnp.transpose(jnp.asarray(imgs), (0, 2, 3, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    conv = convert_openclip_visual(sd, layers=2)
    assert "lora_q_a" in conv["resblocks"]
    params = merge_params(params, conv)
    out = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)


def test_simple_clip_ckpt_open_clip_root():
    """convert_simple_clip_checkpoint handles the `open_clip_model.*` root
    (simple_clip.py:24) including loratorch adapters on both towers."""
    from bioscan_clip_tpu.interop.torch_import import (
        convert_simple_clip_checkpoint,
    )

    torch.manual_seed(8)
    tv = _Visual()
    tt = _Text()
    sd = _attach_synthetic_loratorch(tv, "open_clip_model.visual")
    sd.update(_attach_synthetic_loratorch(tt, "open_clip_model"))
    out = convert_simple_clip_checkpoint(sd)
    assert "image_encoder" in out and "language_encoder" in out
    img = out["image_encoder"]
    txt = out["language_encoder"]["text"]
    assert img["resblocks"]["in_proj"]["kernel"].shape[0] == 2
    assert "lora_v_b" in img["resblocks"]
    assert "lora_q_a" in txt["resblocks"]
    # scaling alpha/r folded into b: b = 0.25 * B^T for r=4
    A = sd["open_clip_model.transformer.resblocks.0.attn.q_lora_A"]
    B = sd["open_clip_model.transformer.resblocks.0.attn.q_lora_B"]
    np.testing.assert_allclose(
        txt["resblocks"]["lora_q_a"][0], A.T, atol=0
    )
    np.testing.assert_allclose(
        txt["resblocks"]["lora_q_b"][0], 0.25 * B.T, atol=1e-7
    )
