"""Online/batch retrieval serving for a trained BIOSCAN-CLIP model.

No reference equivalent (the reference only does offline eval sweeps,
/root/reference/scripts/inference_and_eval.py) — this is the production
path: load the towers + a resident key database once, then answer
taxonomy queries over HTTP or from a JSON file.

    # HTTP daemon
    python -m bioscan_clip_tpu.cli.serve 'model_config=NAME' \\
        'serve.keys=.../extracted_features_of_all_keys.hdf5' \\
        'serve.feature_type=encoded_image_feature' 'serve.port=8901'

    # one-shot batch: read a request JSON, print the response JSON
    python -m bioscan_clip_tpu.cli.serve 'model_config=NAME' \\
        'serve.keys=...' 'serve.once=queries.json'

API (also the `serve.once` file schema):
    GET  /healthz                         -> service info
    POST /embed  {"dna": [...]} | {"image_b64": [...]} | {"text": [...]}
                                          -> {"embeddings": [[...]]}
    POST /search same inputs or {"embedding": [[...]]}, optional "k"
                                          -> {"predictions": [{level: [top-k
                                             labels]}], "similarities": ...}
"""

from __future__ import annotations

import json
import os
import sys


def build_service(args, out=print):
    import jax
    import jax.numpy as jnp

    from bioscan_clip_tpu.models.clip import (
        init_clip_params,
        load_clip_model,
        maybe_merge_lora,
    )
    from bioscan_clip_tpu.parallel.mesh import create_mesh
    from bioscan_clip_tpu.retrieval.service import RetrievalService
    from bioscan_clip_tpu.train.checkpoint import (
        load_pth_into_params,
        resolve_reference_ckpt,
    )
    from bioscan_clip_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    mc = args.model_config
    sv = getattr(args, "serve", {}) or {}
    out("Initialize model...")
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = load_clip_model(args, dtype=dtype)
    params = init_clip_params(model, jax.random.PRNGKey(0))
    ckpt_path = getattr(mc, "ckpt_path", None)
    if ckpt_path and os.path.isdir(ckpt_path):
        resolved = resolve_reference_ckpt(ckpt_path)
        if resolved:
            ckpt_path = resolved
    if getattr(mc, "load_ckpt", True):
        if ckpt_path and os.path.isfile(ckpt_path):
            params = load_pth_into_params(ckpt_path, params, mc.output_dim)
            out(f"Loaded {ckpt_path}")
        else:
            # a retrieval service on random weights answers garbage — be
            # loud (load_ckpt=false is the explicit no-align opt-out)
            raise FileNotFoundError(
                f"serve: no checkpoint at model_config.ckpt_path="
                f"{mc.ckpt_path!r}; set a valid .pth (or directory "
                "containing best.pth/last.pth), or pass "
                "model_config.load_ckpt=false to serve pretrained-init "
                "towers deliberately"
            )
    model, params = maybe_merge_lora(args, model, params, dtype=dtype)
    mesh = create_mesh()
    kw = dict(
        mesh=mesh,
        max_k=int(sv.get("max_k", 5)),
        max_batch=int(sv.get("max_batch", 256)),
        openclip_norm=bool(getattr(mc, "for_open_clip", False)),
        image_host_parity=bool(sv.get("image_host_parity", True)),
        # serve.key_precision=int8: per-row-quantized resident keys + host
        # rescore — 4x key capacity (a 5M x 768 database fits one chip).
        # serve.key_rescore: int8 rescore rows — bfloat16 (default: half
        # the host RAM, ~1e-3 score error), float32 (exact), none (zero
        # host copy, quantized ranking).
        key_precision=str(sv.get("key_precision", "high")),
        key_rescore=str(sv.get("key_rescore", "bfloat16")),
    )
    keys_path = sv.get("keys")
    if keys_path:
        out(f"Loading key database from {keys_path} ...")
        service = RetrievalService.from_export(
            model, params, keys_path,
            feature_type=sv.get("feature_type", "encoded_image_feature"),
            **kw,
        )
        out(f"Key database resident: {service.prepared.n_keys} keys")
    else:
        service = RetrievalService(model, params, **kw)
    return service


def make_handler(service):
    from http.server import BaseHTTPRequestHandler

    from bioscan_clip_tpu.retrieval.service import handle_request

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet access log
            pass

        def do_GET(self):
            if self.path in ("/healthz", "/"):
                self._send(200, service.info())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/search":
                    self._send(200, handle_request(service, body))
                elif self.path == "/embed":
                    import base64

                    if "dna" in body:
                        emb = service.embed_dna(body["dna"])
                    elif "text" in body:
                        emb = service.embed_text(body["text"])
                    elif "image_b64" in body:
                        emb = service.embed_images(
                            [base64.b64decode(s)
                             for s in body["image_b64"]]
                        )
                    else:
                        raise ValueError(
                            "need one of: dna, text, image_b64"
                        )
                    self._send(200, {"embeddings": emb.tolist()})
                else:
                    self._send(404, {"error": "not found"})
            except Exception as e:  # serving: report, don't die
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def run(args, out=print):
    from http.server import ThreadingHTTPServer

    from bioscan_clip_tpu.retrieval.service import handle_request

    service = build_service(args, out=out)
    sv = getattr(args, "serve", {}) or {}

    once = sv.get("once")
    if once:
        with open(once) as f:
            body = json.load(f)
        result = handle_request(service, body)
        output = sv.get("output")
        text = json.dumps(result)
        if output:
            with open(output, "w") as f:
                f.write(text)
            out(f"Wrote {output}")
        else:
            print(text)
        return result

    port = int(sv.get("port", 8901))
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(service))
    out(f"Serving on :{port} (GET /healthz, POST /embed, POST /search)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        out("shutting down")
        httpd.shutdown()


def main(argv=None):
    from bioscan_clip_tpu.config.core import load_config

    argv = argv if argv is not None else sys.argv[1:]
    args = load_config(overrides=list(argv))
    return run(args)


if __name__ == "__main__":
    main()
