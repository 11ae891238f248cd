"""cast_frozen_params (tpu.frozen_dtype=bfloat16): bf16 storage of the
frozen non-LN tower weights must be BIT-IDENTICAL under bf16 compute —
flax casts every Dense/Conv/Embed param to the module dtype per use, so
pre-casting the stored leaf changes nothing downstream. LN params (fp32
consumers, models/common.py ln_dtype) and trainable leaves (AdamW fp32
masters) must stay fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bioscan_clip_tpu.models.bert import (
    BarcodeBertDnaEncoder,
    BertConfig,
    BertTextEncoder,
)
from bioscan_clip_tpu.models.clip import MultiModalCLIP
from bioscan_clip_tpu.models.vit import ViT, ViTConfig
from bioscan_clip_tpu.parallel.mesh import create_mesh, shard_batch
from bioscan_clip_tpu.train.loop import device_batch
from bioscan_clip_tpu.train.state import (
    LN_MODULE_NAMES,
    cast_frozen_params,
    param_labels,
)


def _bf16_model(lora_rank=2):
    """Tiny tri-modal flagship shape in bf16 compute (the TPU train mode)."""
    return MultiModalCLIP(
        image_encoder=ViT(
            ViTConfig(
                image_size=16, patch_size=8, hidden_size=32, num_layers=2,
                num_heads=2, num_classes=24, lora_rank=lora_rank,
            ),
            dtype=jnp.bfloat16,
        ),
        dna_encoder=BarcodeBertDnaEncoder(
            BertConfig(
                vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                intermediate_size=64, lora_rank=lora_rank,
                hidden_dropout=0.1, attention_dropout=0.1,
            ),
            output_dim=24,
            dtype=jnp.bfloat16,
        ),
        language_encoder=BertTextEncoder(
            BertConfig(
                vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                intermediate_size=64, max_position_embeddings=32,
                lora_rank=lora_rank, hidden_dropout=0.1,
                attention_dropout=0.1,
            ),
            output_dim=24,
            dtype=jnp.bfloat16,
        ),
    )


def _batch(B=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(
            rng.standard_normal((B, 16, 16, 3)).astype(np.float32)
        ),
        "dna": jnp.asarray(rng.integers(0, 64, size=(B, 9)), jnp.int32),
        "language": {
            "input_ids": jnp.asarray(
                rng.integers(0, 64, size=(B, 7)), jnp.int32
            ),
            "token_type_ids": jnp.zeros((B, 7), jnp.int32),
            "attention_mask": jnp.ones((B, 7), jnp.int32),
        },
        "labels": jnp.arange(B),
    }


def _init_params(model):
    b = _batch(2)
    return model.init(
        jax.random.PRNGKey(0), b["image"], b["dna"], b["language"],
        deterministic=True,
    )["params"]


def test_cast_placement():
    model = _bf16_model()
    params = _init_params(model)
    cast = cast_frozen_params(params)
    labels = param_labels(params)

    flat = jax.tree_util.tree_flatten_with_path(cast)[0]
    flat_l = jax.tree.leaves(labels)
    n_bf16 = n_ln_f32 = 0
    for ((path, leaf), lab) in zip(flat, flat_l):
        keys = [getattr(p, "key", None) for p in path]
        is_ln = any(k in LN_MODULE_NAMES for k in keys)
        if lab != "frozen":
            assert leaf.dtype == jnp.float32, keys  # trainable masters
        elif is_ln:
            assert leaf.dtype == jnp.float32, keys  # fp32 LN consumers
            n_ln_f32 += 1
        else:
            assert leaf.dtype == jnp.bfloat16, keys
            n_bf16 += 1
    assert n_bf16 > 10 and n_ln_f32 > 5  # both classes actually present


def test_forward_bit_identical():
    model = _bf16_model()
    params = _init_params(model)
    cast = cast_frozen_params(params)
    b = _batch()
    out_a = model.apply({"params": params}, b["image"], b["dna"],
                        b["language"], deterministic=True)
    out_b = model.apply({"params": cast}, b["image"], b["dna"],
                        b["language"], deterministic=True)
    for a, c in zip(out_a, out_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_train_step_bit_identical():
    from bioscan_clip_tpu.train.flat_state import (
        create_flat_train_state,
        make_flat_train_step,
    )

    model = _bf16_model()
    params = _init_params(model)
    mesh = create_mesh()
    b = shard_batch(device_batch(_batch()), mesh)
    rng = jax.random.PRNGKey(7)

    losses, flats = [], []
    for p in (params, cast_frozen_params(params)):
        state = create_flat_train_state(p, lambda s: 1e-3)
        step = make_flat_train_step(model, mesh)
        state, loss = step(state, b, rng)
        state, loss = step(state, b, rng)
        losses.append(float(loss))
        flats.append(np.asarray(state.flat))
    assert losses[0] == losses[1]
    np.testing.assert_array_equal(flats[0], flats[1])


def test_tree_state_step_works_with_bf16_frozen():
    """The CLI's tree-state path (create_train_state + make_train_step)
    accepts a mixed-dtype param tree and matches the fp32-stored run."""
    from bioscan_clip_tpu.train.loop import make_train_step
    from bioscan_clip_tpu.train.state import create_train_state

    model = _bf16_model()
    params = _init_params(model)
    mesh = create_mesh()
    b = shard_batch(device_batch(_batch()), mesh)
    rng = jax.random.PRNGKey(3)

    losses = []
    for p in (params, cast_frozen_params(params)):
        # make_train_step donates the state: give each run its own buffers
        p = jax.tree.map(jnp.array, p)
        state = create_train_state(model, p, lambda s: 1e-3)
        step = make_train_step(model, mesh)
        state, loss = step(state, b, rng)
        state, loss = step(state, b, rng)
        losses.append(float(loss))
    assert losses[0] == losses[1]
