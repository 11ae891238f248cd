"""Golden-activation parity against REAL timm / open_clip models.

Fixtures are produced by tools/make_golden_fixtures.py on a machine with
timm / open_clip installed (this build environment has neither, so these
tests SKIP until the .npz files land in tests/golden/). When present, they
are the strongest available oracle: the Flax towers must reproduce the real
pretrained models' activations through the real converters.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _load(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.isfile(path):
        pytest.skip(f"golden fixture {name} not generated "
                    "(tools/make_golden_fixtures.py needs timm/open_clip)")
    return np.load(path)


def test_vit_base_golden_cls_features():
    z = _load("timm_vit_base_patch16_224.npz")
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd/")}

    from bioscan_clip_tpu.interop.torch_import import (
        convert_timm_vit,
        merge_params,
    )
    from bioscan_clip_tpu.models.vit import ViT, ViTConfig

    model = ViT(ViTConfig(num_classes=768, lora_rank=0), dtype=jnp.float32)
    init = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
        deterministic=True,
    )["params"]
    params = merge_params(init, convert_timm_vit(sd, num_layers=12))

    tokens = model.apply(
        {"params": params}, jnp.asarray(z["inputs"]), deterministic=True,
        return_tokens=True,
    )  # (B, 197, 768) post-norm == timm forward_features
    np.testing.assert_allclose(
        np.asarray(tokens[:, 0]), z["cls_feat"], atol=2e-4, rtol=1e-3
    )


def test_open_clip_vit_l14_golden_features():
    z = _load("open_clip_vit_l14.npz")
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd/")}

    from bioscan_clip_tpu.models.openclip import (
        OpenClipImageTower,
        OpenClipTextAdapter,
        OpenClipTextConfig,
        OpenClipVisionConfig,
        convert_openclip_text,
        convert_openclip_visual,
    )

    img_tower = OpenClipImageTower(
        OpenClipVisionConfig(lora_rank=0), dtype=jnp.float32
    )
    init = img_tower.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
        deterministic=True,
    )["params"]
    from bioscan_clip_tpu.interop.torch_import import merge_params

    params = merge_params(init, convert_openclip_visual(sd, layers=24))
    img = img_tower.apply(
        {"params": params}, jnp.asarray(z["inputs"]), deterministic=True
    )
    np.testing.assert_allclose(
        np.asarray(img), z["image_feat"], atol=5e-4, rtol=2e-3
    )

    txt_tower = OpenClipTextAdapter(
        OpenClipTextConfig(lora_rank=0), dtype=jnp.float32
    )
    tinit = txt_tower.init(
        jax.random.PRNGKey(0),
        jnp.asarray(z["tokens"]),
        deterministic=True,
    )["params"]
    tparams = merge_params(
        tinit, {"text": convert_openclip_text(sd, layers=12)}
    )
    txt = txt_tower.apply(
        {"params": tparams}, jnp.asarray(z["tokens"]), deterministic=True
    )
    np.testing.assert_allclose(
        np.asarray(txt), z["text_feat"], atol=5e-4, rtol=2e-3
    )
