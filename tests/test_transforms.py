"""Device-side transform tests: torchvision-semantics parity where exact
(center crop, flips, rotation geometry) and filter-level closeness for
resize (vs PIL bilinear)."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from bioscan_clip_tpu.data import transforms as T


def _rand_img(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def test_resize_shorter_side_shapes():
    x = jnp.asarray(_rand_img(512, 768)[None]).astype(jnp.float32) / 255
    y = T.resize_shorter_side(x, 256)
    assert y.shape == (1, 256, 384, 3)
    x2 = jnp.asarray(_rand_img(768, 512)[None]).astype(jnp.float32) / 255
    assert T.resize_shorter_side(x2, 256).shape == (1, 384, 256, 3)


def test_resize_close_to_pil_bilinear():
    img = _rand_img(512, 768, seed=1)
    pil = Image.fromarray(img).resize((384, 256), Image.BILINEAR)
    ref = np.asarray(pil).astype(np.float32) / 255
    ours = np.asarray(
        T.resize_shorter_side(
            jnp.asarray(img[None]).astype(jnp.float32) / 255, 256
        )
    )[0]
    # different antialias filters; mean error must be small
    assert np.abs(ours - ref).mean() < 0.01


def test_center_crop_exact():
    img = _rand_img(256, 384, seed=2)
    x = jnp.asarray(img[None]).astype(jnp.float32)
    y = np.asarray(T.center_crop(x, 224))[0]
    top, left = (256 - 224) // 2, (384 - 224) // 2
    np.testing.assert_array_equal(
        y, img[top : top + 224, left : left + 224].astype(np.float32)
    )


def test_eval_transform_pipeline():
    imgs = np.stack([_rand_img(512, 768, seed=i) for i in range(3)])
    out = np.asarray(T.eval_transform(jnp.asarray(imgs)))
    assert out.shape == (3, 224, 224, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0
    # deterministic
    out2 = np.asarray(T.eval_transform(jnp.asarray(imgs)))
    np.testing.assert_array_equal(out, out2)


def test_eval_transform_openclip_normalize():
    imgs = np.stack([_rand_img(256, 256, seed=9)])
    out = np.asarray(T.eval_transform(jnp.asarray(imgs), normalize=True))
    assert out.min() < 0  # normalized values go negative


def test_train_transform_shapes_and_randomness():
    imgs = np.stack([_rand_img(256, 384, seed=i) for i in range(4)])
    a = np.asarray(T.train_transform(jnp.asarray(imgs), jax.random.PRNGKey(0)))
    b = np.asarray(T.train_transform(jnp.asarray(imgs), jax.random.PRNGKey(1)))
    assert a.shape == (4, 224, 224, 3)
    assert np.abs(a - b).max() > 0.01  # different rng -> different augment
    c = np.asarray(T.train_transform(jnp.asarray(imgs), jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(a, c)  # same rng -> reproducible


def test_random_flips_are_exact_flips():
    imgs = jnp.asarray(
        np.arange(2 * 4 * 4 * 1, dtype=np.float32).reshape(2, 4, 4, 1)
    )
    out = np.asarray(T.random_flips(imgs, jax.random.PRNGKey(3)))
    src = np.asarray(imgs)
    for i in range(2):
        candidates = [
            src[i],
            src[i][:, ::-1],
            src[i][::-1],
            src[i][::-1, ::-1],
        ]
        assert any(np.array_equal(out[i], c) for c in candidates)


def test_rotation_zero_angle_identity_and_fill():
    # zero-degree rotation == identity
    imgs = jnp.asarray(_rand_img(32, 32, seed=5)[None]).astype(jnp.float32)
    out = np.asarray(T.random_rotation(imgs, jax.random.PRNGKey(0), degrees=1e-9))
    np.testing.assert_allclose(out[0], np.asarray(imgs)[0], atol=1e-4)
    # large rotation fills corners with 0
    ones = jnp.ones((1, 33, 33, 3))

    def rot(a_deg):
        # drive the internal path deterministically via a huge degrees range
        # that collapses to +/- a: use the public fn many times instead
        return T.random_rotation(ones, jax.random.PRNGKey(1), degrees=45.0)

    out = np.asarray(rot(45.0))[0]
    assert out.min() == 0.0  # corners outside the source are zero-filled
    assert out.max() == 1.0


def test_rrc_box_sampling_bounds():
    rngs = jax.random.split(jax.random.PRNGKey(0), 64)
    boxes = jax.vmap(lambda r: T._sample_rrc_box(r, 256, 384))(rngs)
    i, j, h, w = (np.asarray(b) for b in boxes)
    assert (i >= 0).all() and (j >= 0).all()
    assert ((i + h) <= 256).all() and ((j + w) <= 384).all()
    ratio = w / h
    assert (ratio > 0.74).all() and (ratio < 1.36).all()
    area_frac = (h * w) / (256 * 384)
    assert (area_frac >= 0.05).all() and (area_frac <= 1.001).all()


def test_train_transform_jitter_flag():
    """jitter=True appends ColorJitter(0.5 x4) — the INSECT train transform
    (dataset_for_insect_dataset.py:116-118). Output stays in [0,1] and
    differs from the unjittered pipeline under the same rng."""
    import jax

    from bioscan_clip_tpu.data.transforms import train_transform

    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 256, size=(4, 64, 64, 3)).astype(np.uint8)
    key = jax.random.PRNGKey(0)
    plain = np.asarray(train_transform(imgs, key))
    jit_ = np.asarray(train_transform(imgs, key, jitter=True))
    assert jit_.shape == plain.shape == (4, 224, 224, 3)
    assert jit_.min() >= 0.0 and jit_.max() <= 1.0
    assert not np.allclose(jit_, plain)


def _pil_float_resize(img_u8, out_w, out_h):
    """PIL mode-'F' (float) bilinear resize per channel — the exact
    coefficient algorithm torchvision's antialias=True tensor path
    implements, without uint8 quantization."""
    chans = []
    for c in range(3):
        im = Image.fromarray(img_u8[:, :, c].astype(np.float32), mode="F")
        chans.append(
            np.asarray(im.resize((out_w, out_h), Image.BILINEAR))
        )
    return np.stack(chans, axis=-1)


@pytest.mark.parametrize("hw", [(512, 768), (300, 500), (515, 333), (97, 411)])
def test_host_antialias_resize_matches_pil_float(hw):
    """host_antialias_resize == PIL/torchvision triangle filter to float
    precision, at arbitrary (including odd) source sizes."""
    h, w = hw
    img = _rand_img(h, w, seed=h + w)
    nh, nw = T.tv_resize_size(h, w, 256)
    ref = _pil_float_resize(img, nw, nh)
    ours = T.host_antialias_resize(img.astype(np.float32), nh, nw)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-5)


def test_host_eval_image_full_pipeline():
    """uint8 -> host_eval_image == ToTensor -> Resize(256, antialias) ->
    CenterCrop(224) computed via PIL float resize."""
    img = _rand_img(515, 333, seed=3)
    nh, nw = T.tv_resize_size(515, 333, 256)
    ref = _pil_float_resize(img, nw, nh) / 255.0
    top, left = (nh - 224) // 2, (nw - 224) // 2
    ref = ref[top:top + 224, left:left + 224]
    ours = T.host_eval_image(img)
    assert ours.shape == (224, 224, 3) and ours.dtype == np.float32
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)

    # OpenCLIP normalize variant
    ours_n = T.host_eval_image(img, normalize=True)
    ref_n = (ref - np.asarray(T.CLIP_MEAN)) / np.asarray(T.CLIP_STD)
    np.testing.assert_allclose(ours_n, ref_n, atol=1e-4, rtol=1e-4)


def test_device_resize_close_to_host_parity_resize():
    """The device (jax.image antialias) path stays filter-close to the
    exact host path — quantifies the opt-out fast path's divergence."""
    img = _rand_img(512, 768, seed=4).astype(np.float32) / 255.0
    dev = np.asarray(
        T.resize_shorter_side(jnp.asarray(img[None]), 256)
    )[0]
    host = T.host_antialias_resize(img, 256, 384)
    assert np.abs(dev - host).mean() < 2e-3


def test_host_train_augment_full_pipeline():
    """host_train_augment: RRC + flips + NEAREST rotation on host, uint8
    out; deterministic per rng; zero-angle rotation is identity."""
    import numpy as np

    from bioscan_clip_tpu.data.transforms import (
        host_rotate_nearest,
        host_train_augment,
    )

    img = np.random.default_rng(0).integers(
        0, 256, size=(300, 400, 3)).astype(np.uint8)
    a = host_train_augment(img, np.random.default_rng(5))
    b = host_train_augment(img, np.random.default_rng(5))
    c = host_train_augment(img, np.random.default_rng(6))
    assert a.shape == (224, 224, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    # zero rotation = identity
    np.testing.assert_array_equal(host_rotate_nearest(img, 0.0), img)
    # 90-degree-ish rotation moves pixels and zero-fills corners
    r = host_rotate_nearest(img[:224, :224], 45.0)
    assert r[0, 0].tolist() == [0, 0, 0]


def test_train_transform_pre_cropped_elementwise_only():
    """pre_cropped path: device does only cast/normalize/jitter — output
    equals input/255 exactly (no flips/rotation on device)."""
    import numpy as np

    from bioscan_clip_tpu.data.transforms import train_transform

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (2, 224, 224, 3)),
        jnp.uint8,
    )
    out = train_transform(x, jax.random.PRNGKey(0), pre_cropped=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x, np.float32) / 255.0, atol=1e-7
    )
