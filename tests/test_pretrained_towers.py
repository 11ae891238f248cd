"""load_pretrained_towers: from-pretrained tower initialization.

Parity target: the reference factory loads timm vit_base_patch16_224,
HF prajjwal1/bert-small, BarcodeBERT ckpt and open_clip ViT-L/14 weights at
model build time (/root/reference/bioscanclip/model/simple_clip.py:147-191,
language_encoder.py:12-20). This host has zero egress, so those hub
downloads become local artifact paths under `args.pretrained_weights` —
each path is proven here with a synthetic state dict of the right layout.
"""

import dataclasses
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from bioscan_clip_tpu.models.bert import (
    BarcodeBertDnaEncoder,
    BertConfig,
    BertTextEncoder,
)
from bioscan_clip_tpu.models.vit import ViT, ViTConfig
from bioscan_clip_tpu.train.checkpoint import load_pretrained_towers
from tests.test_vit_parity import _TorchViT


def _args(**pretrained):
    return SimpleNamespace(
        bioscan_bert_checkpoint=pretrained.pop("barcode", None),
        pretrained_weights=SimpleNamespace(
            timm_vit=pretrained.get("timm_vit"),
            bert_small=pretrained.get("bert_small"),
            open_clip=pretrained.get("open_clip"),
        ),
    )


VIT_CFG = ViTConfig(
    image_size=32, patch_size=8, hidden_size=48, num_layers=3, num_heads=4,
    num_classes=24, lora_rank=4,
)
BERT_CFG = BertConfig(
    vocab_size=100, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, lora_rank=4,
)


def _init_vit_params():
    m = ViT(VIT_CFG, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    return m.init(jax.random.PRNGKey(0), x)["params"]


def test_timm_vit_path(tmp_path):
    torch.manual_seed(0)
    tv = _TorchViT(num_classes=1000)  # timm's pretrained 1000-class head
    path = str(tmp_path / "vit_base_patch16_224.pth")
    torch.save(tv.state_dict(), path)

    init = {"image_encoder": _init_vit_params()}
    out = load_pretrained_towers(_args(timm_vit=path), init, output_dim=24)
    img = out["image_encoder"]

    np.testing.assert_allclose(
        np.asarray(img["patch_embed"]["kernel"]),
        tv.patch_embed.proj.weight.detach().numpy().transpose(2, 3, 1, 0),
        atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(img["blocks"]["qkv"]["kernel"][1]),
        tv.blocks[1].attn.qkv.weight.detach().numpy().T,
        atol=0,
    )
    # 1000-class timm head dropped -> head stays at init (reset_classifier
    # semantics, image_encoder.py:94-95); LoRA leaves stay at init too
    np.testing.assert_array_equal(
        np.asarray(out["image_encoder"]["head"]["kernel"]),
        np.asarray(init["image_encoder"]["head"]["kernel"]),
    )
    assert "lora_q_a" in img["blocks"]


def test_timm_vit_missing_artifact_leaves_init(tmp_path):
    init = {"image_encoder": _init_vit_params()}
    msgs = []
    out = load_pretrained_towers(
        _args(timm_vit=str(tmp_path / "nope.pth")), init, output_dim=24,
        log=msgs.append,
    )
    np.testing.assert_array_equal(
        np.asarray(out["image_encoder"]["patch_embed"]["kernel"]),
        np.asarray(init["image_encoder"]["patch_embed"]["kernel"]),
    )
    assert any("random init" in m for m in msgs)


def _hf_bert(vocab=100):
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    return BertModel(
        HFBertConfig(
            vocab_size=vocab, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
        )
    )


def test_bert_small_path_from_file_and_dir(tmp_path):
    torch.manual_seed(1)
    hf = _hf_bert()
    enc = BertTextEncoder(BERT_CFG, output_dim=24, dtype=jnp.float32)
    ids = jnp.zeros((1, 8), jnp.int32)
    init = {
        "language_encoder": enc.init(jax.random.PRNGKey(0), ids)["params"]
    }

    # as a bare .pth file
    f = str(tmp_path / "bert_small.pth")
    torch.save(hf.state_dict(), f)
    out = load_pretrained_towers(_args(bert_small=f), init, output_dim=24)
    got = out["language_encoder"]["bert"]
    np.testing.assert_allclose(
        np.asarray(got["word_embeddings"]["embedding"]),
        hf.embeddings.word_embeddings.weight.detach().numpy(),
        atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(got["layers"]["key"]["kernel"][0]),
        hf.encoder.layer[0].attention.self.key.weight.detach().numpy().T,
        atol=0,
    )
    # proj head is fresh (reference adds it on top of the frozen tower)
    np.testing.assert_array_equal(
        np.asarray(out["language_encoder"]["proj"]["kernel"]),
        np.asarray(init["language_encoder"]["proj"]["kernel"]),
    )

    # as an HF-style model dir
    d = tmp_path / "bert-small"
    d.mkdir()
    torch.save(hf.state_dict(), str(d / "pytorch_model.bin"))
    out2 = load_pretrained_towers(
        _args(bert_small=str(d)), init, output_dim=24
    )
    np.testing.assert_array_equal(
        np.asarray(out2["language_encoder"]["bert"]["layers"]["key"]["kernel"]),
        np.asarray(got["layers"]["key"]["kernel"]),
    )


def test_barcode_bert_path(tmp_path):
    from transformers import BertConfig as HFBertConfig
    from transformers import BertForMaskedLM

    torch.manual_seed(2)
    mlm = BertForMaskedLM(
        HFBertConfig(
            vocab_size=101, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
        )
    )
    path = str(tmp_path / "model_41.pth")
    # DDP-saved: module. prefixes (stripped per util.py:72-84)
    torch.save({f"module.{k}": v for k, v in mlm.state_dict().items()}, path)

    enc = BarcodeBertDnaEncoder(
        dataclasses.replace(BERT_CFG, vocab_size=101), output_dim=24,
        dtype=jnp.float32,
    )
    toks = jnp.zeros((1, 8), jnp.int32)
    init = {"dna_encoder": enc.init(jax.random.PRNGKey(0), toks)["params"]}
    out = load_pretrained_towers(_args(barcode=path), init, output_dim=24)
    got = out["dna_encoder"]

    np.testing.assert_allclose(
        np.asarray(got["bert"]["word_embeddings"]["embedding"]),
        mlm.bert.embeddings.word_embeddings.weight.detach().numpy(),
        atol=0,
    )
    # the vocab-sized MLM decoder is discarded (dna_encoder.py:93-95):
    # the square decoder projection stays at init
    np.testing.assert_array_equal(
        np.asarray(got["decoder"]["kernel"]),
        np.asarray(init["dna_encoder"]["decoder"]["kernel"]),
    )


def _synthetic_openclip_sd(width=32, heads=4, vlayers=2, tlayers=2,
                           patch=8, img=32, vocab=50, ctx=16, out=24):
    rng = np.random.default_rng(3)
    f = lambda *s: rng.standard_normal(s).astype(np.float32)
    sd = {
        "visual.conv1.weight": f(width, 3, patch, patch),
        "visual.class_embedding": f(width),
        "visual.positional_embedding": f((img // patch) ** 2 + 1, width),
        "visual.ln_pre.weight": f(width), "visual.ln_pre.bias": f(width),
        "visual.ln_post.weight": f(width), "visual.ln_post.bias": f(width),
        "visual.proj": f(width, out),
        "token_embedding.weight": f(vocab, width),
        "positional_embedding": f(ctx, width),
        "ln_final.weight": f(width), "ln_final.bias": f(width),
        "text_projection": f(width, out),
    }
    for prefix, n in (("visual.transformer", vlayers), ("transformer", tlayers)):
        for i in range(n):
            L = f"{prefix}.resblocks.{i}."
            sd[L + "ln_1.weight"] = f(width)
            sd[L + "ln_1.bias"] = f(width)
            sd[L + "attn.in_proj_weight"] = f(3 * width, width)
            sd[L + "attn.in_proj_bias"] = f(3 * width)
            sd[L + "attn.out_proj.weight"] = f(width, width)
            sd[L + "attn.out_proj.bias"] = f(width)
            sd[L + "ln_2.weight"] = f(width)
            sd[L + "ln_2.bias"] = f(width)
            sd[L + "mlp.c_fc.weight"] = f(4 * width, width)
            sd[L + "mlp.c_fc.bias"] = f(4 * width)
            sd[L + "mlp.c_proj.weight"] = f(width, 4 * width)
            sd[L + "mlp.c_proj.bias"] = f(width)
    return sd


def test_open_clip_path(tmp_path):
    from bioscan_clip_tpu.models.openclip import (
        OpenClipImageTower,
        OpenClipTextAdapter,
        OpenClipTextConfig,
        OpenClipVisionConfig,
    )

    sd = _synthetic_openclip_sd()
    path = str(tmp_path / "open_clip.pt")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)

    vcfg = OpenClipVisionConfig(
        image_size=32, patch_size=8, width=32, layers=2, heads=4,
        output_dim=24, lora_rank=4,
    )
    tcfg = OpenClipTextConfig(
        context_length=16, vocab_size=50, width=32, layers=2, heads=4,
        output_dim=24, lora_rank=4,
    )
    img_m = OpenClipImageTower(vcfg, dtype=jnp.float32)
    txt_m = OpenClipTextAdapter(tcfg, dtype=jnp.float32)
    init = {
        "image_encoder": img_m.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )["params"],
        "language_encoder": txt_m.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 16), jnp.int32).at[:, 1].set(1),
        )["params"],
    }
    out = load_pretrained_towers(_args(open_clip=path), init, output_dim=24)

    np.testing.assert_allclose(
        np.asarray(out["image_encoder"]["conv1"]["kernel"]),
        sd["visual.conv1.weight"].transpose(2, 3, 1, 0), atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(out["image_encoder"]["resblocks"]["in_proj"]["kernel"][0]),
        sd["visual.transformer.resblocks.0.attn.in_proj_weight"].T, atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(
            out["language_encoder"]["text"]["token_embedding"]["embedding"]
        ),
        sd["token_embedding.weight"], atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(
            out["language_encoder"]["text"]["resblocks"]["c_fc"]["kernel"][1]
        ),
        sd["transformer.resblocks.1.mlp.c_fc.weight"].T, atol=0,
    )
