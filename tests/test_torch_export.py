"""Round-trip: JAX params -> reference-layout state dict -> converted back
must be identical; plus .pth save/load and find_k_closest_records."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bioscan_clip_tpu.interop.torch_export import export_simple_clip, save_pth
from bioscan_clip_tpu.interop.torch_import import (
    convert_simple_clip_checkpoint,
    load_torch_state_dict,
    merge_params,
)
from bioscan_clip_tpu.models.bert import (
    BarcodeBertDnaEncoder,
    BertConfig,
    BertTextEncoder,
)
from bioscan_clip_tpu.models.clip import MultiModalCLIP, init_clip_params
from bioscan_clip_tpu.models.vit import ViT, ViTConfig


def _model():
    kw = dict(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
        lora_rank=2, hidden_dropout=0.0, attention_dropout=0.0,
    )
    return MultiModalCLIP(
        image_encoder=ViT(
            ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                      num_layers=2, num_heads=2, num_classes=24, lora_rank=2),
            dtype=jnp.float32,
        ),
        dna_encoder=BarcodeBertDnaEncoder(
            BertConfig(vocab_size=1027, **kw), output_dim=24,
            dtype=jnp.float32,
        ),
        language_encoder=BertTextEncoder(
            BertConfig(vocab_size=211, **kw), output_dim=24,
            dtype=jnp.float32,
        ),
    )


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
        for k in a:
            _tree_equal(a[k], b[k], path + "/" + str(k))
    else:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7, err_msg=path
        )


def test_export_import_roundtrip():
    model = _model()
    # randomize every leaf so the round trip is non-trivial
    params = init_clip_params(model, jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda x: jnp.asarray(
            rng.standard_normal(x.shape).astype(np.float32)
        ),
        params,
    )
    sd = export_simple_clip(params)
    assert any(k.startswith("image_encoder.lora_vit.blocks.0.attn.qkv.qkv")
               for k in sd)
    conv = convert_simple_clip_checkpoint(sd, output_dim=24)
    merged = merge_params(params, conv)  # shapes must agree
    _tree_equal(params, merged)


def test_save_pth_loads_back(tmp_path):
    pytest.importorskip("torch")
    model = _model()
    params = init_clip_params(model, jax.random.PRNGKey(0))
    p = save_pth(params, str(tmp_path / "export.pth"))
    sd = load_torch_state_dict(p)
    conv = convert_simple_clip_checkpoint(sd, output_dim=24)
    merged = merge_params(params, conv)
    _tree_equal(params, merged)


def test_find_k_closest_records():
    from bioscan_clip_tpu.retrieval.engine import find_k_closest_records

    rng = np.random.default_rng(0)
    keys = rng.standard_normal((10, 8)).astype(np.float32)
    queries = keys[[2, 7]] + 0.001
    out = find_k_closest_records(
        ["q0", "q1"], queries, [f"k{i}" for i in range(10)], keys, k=3
    )
    assert out["q0"][0] == "k2"
    assert out["q1"][0] == "k7"
    assert len(out["q0"]) == 3
