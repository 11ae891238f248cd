"""method_one_eval CLI end-to-end on synthetic data + factory branch tests
(dna.freeze identity route, feature-input MLP route)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.fixtures import SyntheticArgs, build_synthetic_dataset


@pytest.fixture(scope="module")
def args(tmp_path_factory):
    p = tmp_path_factory.mktemp("m1") / "synth.hdf5"
    build_synthetic_dataset(str(p), n_classes=4, per_class=6)
    a = SyntheticArgs(str(p), batch_size=6)
    a.cfg.merge(
        {
            "project_root_path": str(tmp_path_factory.mktemp("proj")),
            "inference_and_eval_setting": {"eval_on": "val", "k_list": [1, 3, 5]},
            "debug_flag": True,
        }
    )
    a.cfg.model_config.merge({"load_ckpt": False})
    return a


def _tiny(args, dtype=jnp.float32):
    import bioscan_clip_tpu.models.clip as cm
    from bioscan_clip_tpu.models.bert import (
        BarcodeBertDnaEncoder,
        BertConfig,
        BertTextEncoder,
    )
    from bioscan_clip_tpu.models.vit import ViT, ViTConfig

    kw = dict(
        hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
        lora_rank=2, hidden_dropout=0.0, attention_dropout=0.0,
    )
    return cm.MultiModalCLIP(
        image_encoder=ViT(
            ViTConfig(image_size=224, patch_size=32, hidden_size=32,
                      num_layers=1, num_heads=2, num_classes=32, lora_rank=2),
            dtype=jnp.float32,
        ),
        dna_encoder=BarcodeBertDnaEncoder(
            BertConfig(vocab_size=1027, **kw), output_dim=32,
            dtype=jnp.float32,
        ),
        language_encoder=BertTextEncoder(
            BertConfig(vocab_size=30522, **kw), output_dim=32,
            dtype=jnp.float32,
        ),
    )


def test_method_one_eval_cli(args, monkeypatch):
    import bioscan_clip_tpu.cli.method_one_eval as m1
    import bioscan_clip_tpu.models.clip as cm

    monkeypatch.setattr(cm, "load_clip_model", _tiny)
    lines = []
    seen_out, unseen_out = m1.run(args, out=lines.append, num_intervals=21)
    assert 0.0 <= seen_out["micro_acc"][1]["species"] <= 1.0
    assert 0.0 <= unseen_out["best_threshold"] <= 1.0
    assert any("best threshold" in l for l in lines)
    # per-level harmonic-mean rows printed
    assert any(len(l.split()) == 12 for l in lines)


def test_factory_dna_freeze_branch():
    from bioscan_clip_tpu.config.core import load_config
    from bioscan_clip_tpu.models.clip import load_clip_model
    from bioscan_clip_tpu.models.mlp import IdentityEncoder

    cfg = load_config(
        model_config="lora_vit_lora_barcode_bert_lora_bert_ssl",
        project_root_path="/tmp",
    )
    cfg.model_config.dna.freeze = True
    model = load_clip_model(cfg, dtype=jnp.float32)
    assert isinstance(model.dna_encoder, IdentityEncoder)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, 768)).astype(np.float32)
    )
    # identity tower has no params; init with only dna_input yields an
    # empty variables dict
    variables = model.init(jax.random.PRNGKey(0), dna_input=feats)
    _, dna, _ = model.apply(variables, dna_input=feats)
    # identity encoder output is just the normalized input features
    np.testing.assert_allclose(
        np.asarray(dna),
        np.asarray(feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)),
        atol=1e-6,
    )


def test_factory_feature_input_mlp_branch():
    from bioscan_clip_tpu.config.core import load_config
    from bioscan_clip_tpu.models.clip import load_clip_model
    from bioscan_clip_tpu.models.mlp import MLPEncoder

    cfg = load_config(
        model_config="lora_vit_lora_barcode_bert_lora_bert_ssl",
        project_root_path="/tmp",
    )
    cfg.model_config.image.merge({"input_type": "feature", "input_dim": 512,
                                  "hidden_dim": 256})
    cfg.model_config.dna.merge({"input_type": "feature", "input_dim": 768,
                                "hidden_dim": 256})
    model = load_clip_model(cfg, dtype=jnp.float32)
    assert isinstance(model.image_encoder, MLPEncoder)
    assert isinstance(model.dna_encoder, MLPEncoder)


def test_mlp_version_clip():
    from bioscan_clip_tpu.models.mlp import MLPVersionCLIP

    m = MLPVersionCLIP(image_input_dim=512, dna_input_dim=768,
                       hidden_dim=64, output_dim=32)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32))
    dna = jnp.asarray(rng.standard_normal((4, 768)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), img, dna)["params"]
    i, d = m.apply({"params": params}, img, dna)
    assert i.shape == (4, 32) and d.shape == (4, 32)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(i, axis=-1)), 1.0, atol=1e-6
    )
