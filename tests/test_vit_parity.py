"""Bit-faithfulness tests: timm-geometry torch ViT vs Flax ViT via converter.

timm isn't installed here, so the torch reference below re-implements the
documented `vit_base_patch16_224` forward (pre-LN blocks, fused qkv, exact
GELU, CLS pooling — see image_encoder.py:15-23 for timm's fused-qkv layout)
at a reduced size, emitting state-dict keys in timm's naming so the
converter's key mapping is exercised end-to-end, including the LoRA-wrapped
`qkv.qkv` + `linear_{a,b}_{q,v}` layout of released checkpoints.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from bioscan_clip_tpu.interop.torch_import import convert_timm_vit, merge_params
from bioscan_clip_tpu.models.vit import ViT, ViTConfig


class _TorchAttn(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.h = heads
        self.hd = dim // heads
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B, N, 3, self.h, self.hd)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.hd**-0.5
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class _TorchLoRAQkv(tnn.Module):
    """Reference _LoRA_qkv_timm semantics (image_encoder.py:42-48)."""

    def __init__(self, qkv, dim, r):
        super().__init__()
        self.qkv = qkv
        self.dim = dim
        self.linear_a_q = tnn.Linear(dim, r, bias=False)
        self.linear_b_q = tnn.Linear(r, dim, bias=False)
        self.linear_a_v = tnn.Linear(dim, r, bias=False)
        self.linear_b_v = tnn.Linear(r, dim, bias=False)
        for m in (self.linear_a_q, self.linear_b_q, self.linear_a_v, self.linear_b_v):
            tnn.init.normal_(m.weight, std=0.2)

    def forward(self, x):
        qkv = self.qkv(x)
        qkv[:, :, : self.dim] = qkv[:, :, : self.dim] + self.linear_b_q(
            self.linear_a_q(x)
        )
        qkv[:, :, -self.dim :] = qkv[:, :, -self.dim :] + self.linear_b_v(
            self.linear_a_v(x)
        )
        return qkv


class _TorchBlock(tnn.Module):
    def __init__(self, dim, heads, mlp_ratio):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = _TorchAttn(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Sequential()
        self.mlp.fc1 = tnn.Linear(dim, dim * mlp_ratio)
        self.mlp.act = tnn.GELU()
        self.mlp.fc2 = tnn.Linear(dim * mlp_ratio, dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp.fc2(self.mlp.act(self.mlp.fc1(self.norm2(x))))
        return x


class _TorchViT(tnn.Module):
    """timm-naming mini ViT (state_dict keys match vit_base_patch16_224)."""

    def __init__(self, img=32, patch=8, dim=48, depth=3, heads=4, num_classes=24):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, stride=patch)
        n = (img // patch) ** 2
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = tnn.ModuleList(
            [_TorchBlock(dim, heads, 4) for _ in range(depth)]
        )
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.head = tnn.Linear(dim, num_classes)

    def forward(self, x):
        x = self.patch_embed.proj(x)  # (B, D, H', W')
        x = x.flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return self.head(x[:, 0])


CFG = ViTConfig(
    image_size=32, patch_size=8, hidden_size=48, num_layers=3, num_heads=4,
    num_classes=24, lora_rank=0,
)


def _run_parity(torch_model, jax_cfg):
    torch_model.eval()
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.tensor(imgs)).numpy()

    model = ViT(jax_cfg, dtype=jnp.float32)
    x = jnp.transpose(jnp.asarray(imgs), (0, 2, 3, 1))  # NCHW -> NHWC
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    params = merge_params(
        params,
        convert_timm_vit(
            sd, num_layers=jax_cfg.num_layers, head_out=jax_cfg.num_classes
        ),
    )
    out = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_vit_parity_plain():
    torch.manual_seed(0)
    _run_parity(_TorchViT(), CFG)


def test_vit_parity_lora_wrapped():
    """Converter handles released-checkpoint key layout: head.weight is
    (768-out in real ckpts; here square-out test analog) + LoRA fused-qkv."""
    torch.manual_seed(1)
    m = _TorchViT()
    for blk in m.blocks:
        blk.attn.qkv = _TorchLoRAQkv(blk.attn.qkv, 48, r=4)
    import dataclasses

    _run_parity(m, dataclasses.replace(CFG, lora_rank=4))


def test_vit_head_768_loaded_from_ckpt():
    """A 768-out head in the state dict must be converted (SimpleCLIP ckpt
    case); non-768 heads (timm's 1000-class) are dropped."""
    torch.manual_seed(2)
    m = _TorchViT(num_classes=768)
    m.eval()
    sd = {f"lora_vit.{k}": v.detach().numpy() for k, v in m.state_dict().items()}
    conv = convert_timm_vit(sd, num_layers=3)
    assert "head" in conv and conv["head"]["kernel"].shape == (48, 768)

    sd2 = {k: v for k, v in sd.items()}
    sd2["lora_vit.head.weight"] = np.zeros((1000, 48), np.float32)
    sd2["lora_vit.head.bias"] = np.zeros((1000,), np.float32)
    conv2 = convert_timm_vit(sd2, num_layers=3)
    assert "head" not in conv2
