"""BSCAN_FAST_LN: bf16 LayerNorm compute is an opt-in inference-throughput
knob (models/common.py). These tests pin (a) default-off exactness and
(b) a small bounded drift when on."""

import numpy as np
import jax
import jax.numpy as jnp

from bioscan_clip_tpu.models.vit import ViT, ViTConfig


def _embed(monkeypatch, fast: bool):
    monkeypatch.setenv("BSCAN_FAST_LN", "1" if fast else "0")
    model = ViT(
        ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=2,
                  num_heads=2, num_classes=16, lora_rank=2),
        dtype=jnp.bfloat16,
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x, deterministic=True)["params"]
    out = model.apply({"params": params}, x, deterministic=True)
    return np.asarray(out, np.float32)


def test_fast_ln_default_off_is_exact(monkeypatch):
    a = _embed(monkeypatch, fast=False)
    monkeypatch.delenv("BSCAN_FAST_LN", raising=False)
    b = _embed(monkeypatch, fast=False)
    np.testing.assert_array_equal(a, b)


def test_fast_ln_drift_bounded(monkeypatch):
    ref = _embed(monkeypatch, fast=False)
    fast = _embed(monkeypatch, fast=True)
    # normalized-embedding cosine: the retrieval-relevant metric
    rn = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    fn = fast / np.linalg.norm(fast, axis=-1, keepdims=True)
    cos = (rn * fn).sum(-1)
    assert cos.min() > 0.999, cos


def _train_losses(monkeypatch, fast: bool, steps: int = 8):
    """Loss trajectory of a tiny CLIP train run under the given LN mode.

    fast_ln is now a supported TRAIN knob (tpu.fast_ln / BSCAN_FAST_LN):
    bf16 normalize/output with f32 statistics (flax forces f32 LN
    reductions). This pins the loss-trajectory drift vs fp32-LN so the
    champion train config's numerics class stays bounded, not vibes."""
    monkeypatch.setenv("BSCAN_FAST_LN", "1" if fast else "0")
    import jax
    import numpy as np
    from bioscan_clip_tpu.models.bert import BarcodeBertDnaEncoder, BertConfig
    from bioscan_clip_tpu.models.clip import MultiModalCLIP
    from bioscan_clip_tpu.parallel.mesh import create_mesh, shard_batch
    from bioscan_clip_tpu.train.loop import make_train_step
    from bioscan_clip_tpu.train.state import create_train_state

    model = MultiModalCLIP(
        image_encoder=ViT(
            ViTConfig(image_size=16, patch_size=8, hidden_size=32,
                      num_layers=2, num_heads=2, num_classes=24,
                      lora_rank=2),
            dtype=jnp.bfloat16,
        ),
        dna_encoder=BarcodeBertDnaEncoder(
            BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                       num_heads=2, intermediate_size=64, lora_rank=2,
                       hidden_dropout=0.0, attention_dropout=0.0),
            output_dim=24,
            dtype=jnp.bfloat16,
        ),
        language_encoder=None,
    )
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.standard_normal((16, 16, 16, 3)).astype(np.float32)),
        "dna": jnp.asarray(rng.integers(0, 64, size=(16, 9)), jnp.int32),
        "labels": jnp.arange(16),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["image"], batch["dna"])["params"]
    state = create_train_state(model, params, lambda s: 1e-2)
    mesh = create_mesh()
    step = make_train_step(model, mesh)
    sb = shard_batch(batch, mesh)
    losses = []
    for i in range(steps):
        state, loss = step(state, sb, jax.random.PRNGKey(i))
        losses.append(float(loss))
    return np.asarray(losses)


def test_fast_ln_train_loss_trajectory_bounded(monkeypatch):
    ref = _train_losses(monkeypatch, fast=False)
    fast = _train_losses(monkeypatch, fast=True)
    # same descent behaviour: every step's loss within 2% relative of the
    # fp32-LN trajectory, and both end below where they started
    np.testing.assert_allclose(fast, ref, rtol=2e-2)
    assert fast[-1] < fast[0] and ref[-1] < ref[0]
