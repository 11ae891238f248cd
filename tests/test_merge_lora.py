"""merge_lora_params: folding adapters into host kernels is the LoRA
deployment transform — outputs must match the adapter model up to compute-
dtype rounding, for all three host layouts (ViT fused qkv, OpenCLIP packed
in_proj, HF BERT separate query/value), and the merged tree must load into
the same architecture built with lora_rank=0."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bioscan_clip_tpu.models.bert import BertConfig, BertTextEncoder
from bioscan_clip_tpu.models.lora import merge_lora_params
from bioscan_clip_tpu.models.vit import ViT, ViTConfig


def _randomize_lora_b(params, seed=0):
    """B kernels init to zero (identity-preserving start); give them real
    values so the merge actually moves the kernels."""
    rng = np.random.default_rng(seed)

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k.startswith("lora_") and k.endswith("_b"):
                out[k] = jnp.asarray(
                    rng.standard_normal(v.shape).astype(np.float32) * 0.05
                )
            else:
                out[k] = walk(v)
        return out

    return walk(params)


def _assert_no_lora(params):
    leaves = jax.tree_util.tree_leaves_with_path(params)
    for path, _ in leaves:
        assert "lora" not in jax.tree_util.keystr(path)


def test_merge_vit_fused_qkv():
    cfg = ViTConfig(
        image_size=32, patch_size=16, hidden_size=32, num_layers=2,
        num_heads=2, mlp_ratio=2, num_classes=16, lora_rank=2,
    )
    model = ViT(cfg, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    params = _randomize_lora_b(params)
    ref = model.apply({"params": params}, x)

    merged = merge_lora_params(params)
    _assert_no_lora(merged)
    model0 = ViT(dataclasses.replace(cfg, lora_rank=0), dtype=jnp.float32)
    out = model0.apply({"params": merged}, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_merge_bert_query_value():
    cfg = BertConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, lora_rank=2, hidden_dropout=0.0,
        attention_dropout=0.0,
    )
    model = BertTextEncoder(cfg, output_dim=16, dtype=jnp.float32)
    ids = jnp.asarray(
        np.random.default_rng(2).integers(0, 64, size=(3, 12)), jnp.int32
    )
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), ids, attention_mask=mask)[
        "params"
    ]
    params = _randomize_lora_b(params, seed=3)
    ref = model.apply({"params": params}, ids, attention_mask=mask)

    merged = merge_lora_params(params)
    _assert_no_lora(merged)
    model0 = BertTextEncoder(
        dataclasses.replace(cfg, lora_rank=0), output_dim=16,
        dtype=jnp.float32,
    )
    out = model0.apply({"params": merged}, ids, attention_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_merge_openclip_in_proj():
    from bioscan_clip_tpu.models.openclip import (
        OpenClipTextConfig,
        OpenClipTextTower,
    )

    cfg = OpenClipTextConfig(
        context_length=16, vocab_size=97, width=32, layers=2, heads=4,
        output_dim=24, lora_rank=2,
    )
    model = OpenClipTextTower(cfg, dtype=jnp.float32)
    ids = np.random.default_rng(4).integers(1, 90, size=(3, 16))
    ids[:, -1] = 96  # EOT pooling position
    ids = jnp.asarray(ids, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    params = _randomize_lora_b(params, seed=5)
    ref = model.apply({"params": params}, ids)

    merged = merge_lora_params(params)
    _assert_no_lora(merged)
    model0 = OpenClipTextTower(
        dataclasses.replace(cfg, lora_rank=0), dtype=jnp.float32
    )
    out = model0.apply({"params": merged}, ids)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_merge_no_lora_is_identity():
    cfg = ViTConfig(
        image_size=32, patch_size=16, hidden_size=32, num_layers=2,
        num_heads=2, mlp_ratio=2, num_classes=16, lora_rank=0,
    )
    model = ViT(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    merged = merge_lora_params(params)
    assert jax.tree_util.tree_structure(merged) == (
        jax.tree_util.tree_structure(params)
    )


def test_maybe_merge_lora_knob(monkeypatch):
    import bioscan_clip_tpu.models.clip as clip_mod
    from bioscan_clip_tpu.config.core import load_config
    from bioscan_clip_tpu.models.clip import init_clip_params, maybe_merge_lora

    def tiny(args, dtype=jnp.float32, lora_rank=None):
        rank = 2 if lora_rank is None else lora_rank
        return clip_mod.MultiModalCLIP(
            image_encoder=ViT(
                ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                          num_layers=1, num_heads=2, num_classes=32,
                          lora_rank=rank),
                dtype=jnp.float32,
            ),
            dna_encoder=None,
            language_encoder=None,
        )

    monkeypatch.setattr(clip_mod, "load_clip_model", tiny)
    args = load_config(overrides=["tpu.merge_lora=true"])
    model = tiny(args)
    params = init_clip_params(model, jax.random.PRNGKey(0))
    params = _randomize_lora_b(params, seed=7)
    x = jnp.asarray(
        np.random.default_rng(8).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    ref, _, _ = model.apply({"params": params}, image_input=x)

    merged_model, merged = maybe_merge_lora(
        args, model, params, dtype=jnp.float32
    )
    _assert_no_lora(merged)
    out, _, _ = merged_model.apply({"params": merged}, image_input=x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )

    args2 = load_config()
    m2, p2 = maybe_merge_lora(args2, model, params, dtype=jnp.float32)
    assert m2 is model and p2 is params  # knob off: untouched
