"""Retrieval serving (retrieval/service.py + cli/serve.py): raw inputs ->
embeddings -> top-k taxonomy, bucketed jit, HTTP round trip."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bioscan_clip_tpu.models.bert import BarcodeBertDnaEncoder, BertConfig
from bioscan_clip_tpu.models.clip import MultiModalCLIP
from bioscan_clip_tpu.models.vit import ViT, ViTConfig
from bioscan_clip_tpu.retrieval.service import (
    RetrievalService,
    handle_request,
)

D_OUT = 24


def _tiny_service(n_keys=40, with_keys=True):
    model = MultiModalCLIP(
        image_encoder=ViT(
            ViTConfig(
                image_size=224, patch_size=32, hidden_size=32, num_layers=2,
                num_heads=2, num_classes=D_OUT, lora_rank=2,
            ),
            dtype=jnp.float32,
        ),
        dna_encoder=BarcodeBertDnaEncoder(
            BertConfig(
                vocab_size=1027, hidden_size=32, num_layers=2, num_heads=2,
                intermediate_size=64, lora_rank=2, hidden_dropout=0.0,
                attention_dropout=0.0,
            ),
            output_dim=D_OUT, dtype=jnp.float32,
        ),
        language_encoder=None,
    )
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3)),
        jnp.zeros((1, 133), jnp.int32),
        None,
        deterministic=True,
    )["params"]
    keys = None
    labels = None
    if with_keys:
        keys = rng.standard_normal((n_keys, D_OUT)).astype(np.float32)
        labels = [
            {
                "order": f"o{i % 3}",
                "family": f"f{i % 5}",
                "genus": f"g{i % 7}",
                "species": f"s{i}",
            }
            for i in range(n_keys)
        ]
    return RetrievalService(
        model, params, keys=keys, key_labels=labels, max_k=3, max_batch=8
    )


@pytest.fixture(scope="module")
def service():
    return _tiny_service()


def _barcodes(n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        "".join(rng.choice(list("ACGT"), size=658))
        for _ in range(n)
    ]


def test_embed_dna_normalized(service):
    emb = service.embed_dna(_barcodes(3))
    assert emb.shape == (3, D_OUT)
    np.testing.assert_allclose(
        np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5
    )


def test_embed_images_bucketed(service):
    rng = np.random.default_rng(1)
    # odd count + varying sizes exercise decode-free path and bucketing
    imgs = [
        rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        for h, w in ((256, 340), (300, 300), (256, 256), (280, 310),
                     (260, 261))
    ]
    emb = service.embed_images(imgs)
    assert emb.shape == (5, D_OUT)
    # bucket padding must not change results: single vs batched
    solo = service.embed_images(imgs[:1])
    np.testing.assert_allclose(solo[0], emb[0], atol=1e-5)


def test_search_identity_topk():
    rng = np.random.default_rng(2)
    keys = rng.standard_normal((16, D_OUT)).astype(np.float32)
    svc = _tiny_service(with_keys=False)
    labels = [
        {"order": "o", "family": "f", "genus": "g", "species": f"s{i}"}
        for i in range(16)
    ]
    svc.set_keys(keys, labels)
    from bioscan_clip_tpu.retrieval.engine import l2norm_np

    out = svc.search(embeddings=l2norm_np(keys[:4]), k=1)
    got = [p["species"][0] for p in out["predictions"]]
    assert got == ["s0", "s1", "s2", "s3"]
    assert np.allclose(np.asarray(out["similarities"])[:, 0], 1.0,
                       atol=1e-5)


def test_search_int8_key_database():
    """serve.key_precision=int8: quantized resident keys answer identically
    to the fp32 database on well-separated keys. The serving default rescore
    storage is bfloat16 (half the host RAM, docs/SERVING.md), so scores carry
    the keys' bf16 representation error (~1e-3 relative); an explicit
    key_rescore="float32" service returns exact self-similarities."""
    rng = np.random.default_rng(11)
    keys = rng.standard_normal((32, D_OUT)).astype(np.float32)
    labels = [
        {"order": "o", "family": "f", "genus": "g", "species": f"s{i}"}
        for i in range(32)
    ]
    from bioscan_clip_tpu.retrieval.engine import l2norm_np

    svc = _tiny_service(with_keys=False)
    assert svc.key_rescore == "bfloat16"  # documented serving default
    svc.key_precision = "int8"
    svc.set_keys(keys, labels)
    assert svc.prepared.int8
    out = svc.search(embeddings=l2norm_np(keys[:5]), k=1)
    got = [p["species"][0] for p in out["predictions"]]
    assert got == [f"s{i}" for i in range(5)]
    # bf16 rescore rows: exact ranking here, scores within bf16 key error
    assert np.allclose(np.asarray(out["similarities"])[:, 0], 1.0,
                       atol=4e-3)

    svc32 = _tiny_service(with_keys=False)
    svc32.key_precision = "int8"
    svc32.key_rescore = "float32"
    svc32.set_keys(keys, labels)
    out32 = svc32.search(embeddings=l2norm_np(keys[:5]), k=1)
    got32 = [p["species"][0] for p in out32["predictions"]]
    assert got32 == [f"s{i}" for i in range(5)]
    assert np.allclose(np.asarray(out32["similarities"])[:, 0], 1.0,
                       atol=1e-5)


def test_embed_images_device_eval_path(service):
    """host_parity=False (cv2 crop + device resize) stays close to the
    bit-faithful host path: unit-norm, same shape, high cosine."""
    rng = np.random.default_rng(7)
    imgs = [
        rng.integers(0, 256, size=(300, 400, 3)).astype(np.uint8)
        for _ in range(3)
    ]
    a = service.embed_images(imgs, host_parity=True)
    b = service.embed_images(imgs, host_parity=False)
    assert b.shape == a.shape
    np.testing.assert_allclose(np.linalg.norm(b, axis=-1), 1.0, atol=1e-5)
    cos = np.sum(a * b, axis=-1)
    assert np.all(cos > 0.9), cos


def test_search_multi_device_mesh():
    """Key database sharded across the 8-device mesh through the service:
    same results as the single-device path."""
    from bioscan_clip_tpu.parallel.mesh import create_mesh
    from bioscan_clip_tpu.retrieval.engine import l2norm_np

    rng = np.random.default_rng(5)
    keys = rng.standard_normal((64, D_OUT)).astype(np.float32)
    labels = [
        {"order": "o", "family": "f", "genus": "g", "species": f"s{i}"}
        for i in range(64)
    ]
    svc1 = _tiny_service(with_keys=False)
    svc1.set_keys(keys, labels)
    svc8 = _tiny_service(with_keys=False)
    svc8.mesh = create_mesh()
    svc8.set_keys(keys, labels)
    assert svc8.prepared.n_dev == len(jax.devices())

    q = l2norm_np(rng.standard_normal((5, D_OUT)).astype(np.float32))
    out1 = svc1.search(embeddings=q, k=3)
    out8 = svc8.search(embeddings=q, k=3)
    assert out1["predictions"] == out8["predictions"]
    np.testing.assert_allclose(
        out1["similarities"], out8["similarities"], atol=1e-5
    )


def test_search_via_dna(service):
    out = service.search(dna=_barcodes(2), k=3)
    assert len(out["predictions"]) == 2
    for p in out["predictions"]:
        for lvl in ("order", "family", "genus", "species"):
            assert len(p[lvl]) == 3


def test_handle_request_embedding(service):
    rng = np.random.default_rng(3)
    body = {
        "embedding": rng.standard_normal((2, D_OUT)).tolist(),
        "k": 2,
    }
    out = handle_request(service, body)
    assert len(out["predictions"]) == 2
    assert len(out["predictions"][0]["species"]) == 2


def test_http_round_trip(service):
    from http.server import ThreadingHTTPServer

    from bioscan_clip_tpu.cli.serve import make_handler

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            info = json.loads(r.read())
        assert info["status"] == "ok" and info["n_keys"] == 40
        assert "dna" in info["towers"]

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search",
            data=json.dumps({"dna": _barcodes(2), "k": 2}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["predictions"]) == 2
        assert len(out["predictions"][0]["species"]) == 2

        # malformed request -> 400 with an error payload, server survives
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search", data=b'{"nope": 1}',
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        httpd.shutdown()
