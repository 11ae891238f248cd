"""Full-system demo ON the real TPU: every user-facing stage in one run.

    synthetic BIOSCAN-style HDF5 (tests/fixtures.py)
      -> cli/train_cl.run       (flagship LoRA towers, dots remat, rbg PRNG,
                                 host train_crop; inline retrieval eval +
                                 async orbax ckpts)
      -> interop .pth export    (reference-layout state dict)
      -> cli/extract_embedding  (per-split embedding HDF5 exports, loading
                                 the .pth through the torch-interop path)
      -> cli/serve once-mode    (DNA-barcode query against the exported
                                 all_keys database)

The CPU test suite drives the same journey with tiny towers
(tests/test_cli.py); this script is the real-hardware counterpart with the
full-size flagship. Writes E2E_TPU_r03.json at the repo root. ~30-60 min
through the tunnel (compiles dominate).
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_CLASSES = 6
PER_CLASS = 32
BATCH = 48
EPOCHS = 2


def _patch_tiny_towers():
    import bioscan_clip_tpu.models.clip as clip_mod
    from tests.test_cli import _tiny_factory

    clip_mod.load_clip_model = _tiny_factory(clip_mod)


def main():
    record = {"phases": {}, "device": None}
    work = os.environ.get("BSCAN_E2E_DIR", "/tmp/bscan_e2e_demo")
    os.makedirs(work, exist_ok=True)
    ds = os.path.join(work, "synthetic_1m.hdf5")

    t0 = time.time()
    from tests.fixtures import build_synthetic_dataset, make_barcode

    build_synthetic_dataset(ds, n_classes=N_CLASSES, per_class=PER_CLASS)
    record["phases"]["build_dataset_s"] = round(time.time() - t0, 1)

    import jax

    if os.environ.get("BSCAN_E2E_TINY"):
        # plumbing mode runs on CPU; the ambient sitecustomize pins the
        # axon TPU plugin, so the config update (not the env var) is the
        # only effective override
        jax.config.update("jax_platforms", "cpu")

    # The tunneled TPU worker restarts itself after watchdog kills, and jax
    # caches a failed backend init for the life of the process — so probe
    # for availability in SUBPROCESSES (up to ~20 min) before the first
    # in-process jax.devices() call.
    if not os.environ.get("BSCAN_E2E_TINY"):
        import subprocess

        probe = ("import jax; d=jax.devices()[0]; "
                 "print('ok', d)")
        deadline = time.time() + float(
            os.environ.get("BSCAN_E2E_WAIT_S", 1200)
        )
        while True:
            err = ""
            try:
                r = subprocess.run(
                    [sys.executable, "-c", probe], capture_output=True,
                    text=True, timeout=600,
                )
                if r.returncode == 0 and "ok" in r.stdout:
                    break
                err = r.stderr[-2000:]
            except subprocess.TimeoutExpired:
                err = "probe timed out (600 s)"
            if time.time() > deadline:
                raise RuntimeError(f"TPU backend unavailable:\n{err}")
            print("backend unavailable; retrying in 60 s", flush=True)
            time.sleep(60)

    record["device"] = str(jax.devices()[0])

    if os.environ.get("BSCAN_E2E_TINY"):
        # plumbing-test mode (CPU-friendly): swap the flagship towers for
        # tiny ones; every stage, path, and config override stays identical
        _patch_tiny_towers()
        record["tiny_towers"] = True

    from bioscan_clip_tpu.config.core import load_config

    overrides = [
        "model_config=lora_vit_lora_barcode_bert_lora_bert_ssl",
        f"bioscan_data.path_to_hdf5_data={ds}",
        f"model_config.batch_size={BATCH}",
        f"model_config.epochs={EPOCHS}",
        "model_config.evaluation_period=1",
        "model_config.load_ckpt=false",
        "model_config.model_output_name=e2e_tpu_demo",
        "debug_flag=false",
        "activate_wandb=false",
        "save_inference=false",
        "save_ckpt=true",
        "tpu.remat=true",
        "tpu.remat_policy=dots",
        "tpu.rng_impl=rbg",
        "tpu.train_crop=true",
    ]
    args = load_config(overrides=overrides, project_root_path=work)

    log_tail = []

    def out(*a):
        line = " ".join(str(x) for x in a)
        print(line, flush=True)
        log_tail.append(line)
        del log_tail[:-40]

    from bioscan_clip_tpu.cli.train_cl import run as train_run

    t0 = time.time()
    state, best_acc = train_run(args, out=out)
    record["phases"]["train_cl_s"] = round(time.time() - t0, 1)
    record["best_mean_species_top1"] = (
        None if best_acc is None else round(float(best_acc), 4)
    )
    record["train_log_tail"] = log_tail[-12:]

    # reference-layout .pth export of the TRAINED params (interop round
    # trip: JAX -> torch state dict -> JAX, the path released checkpoints
    # take in the other direction). Tiny plumbing mode skips the export
    # (tiny towers aren't flagship-layout) and runs ckpt-less downstream.
    import numpy as np

    if os.environ.get("BSCAN_E2E_TINY"):
        ckpt_overrides = ["model_config.load_ckpt=false"]
    else:
        from bioscan_clip_tpu.interop.torch_export import save_pth

        t0 = time.time()
        host_params = jax.tree.map(np.asarray, state.params)
        pth = os.path.join(work, "e2e_trained.pth")
        save_pth(host_params, pth)
        record["phases"]["pth_export_s"] = round(time.time() - t0, 1)
        ckpt_overrides = [f"model_config.ckpt_path={pth}"]

    from bioscan_clip_tpu.cli.extract_embedding import run as extract_run

    args2 = load_config(
        overrides=[
            "model_config=lora_vit_lora_barcode_bert_lora_bert_ssl",
            f"bioscan_data.path_to_hdf5_data={ds}",
            "model_config.model_output_name=e2e_tpu_demo",
        ] + ckpt_overrides,
        project_root_path=work,
    )
    t0 = time.time()
    extract_run(args2, out=out)
    record["phases"]["extract_embedding_s"] = round(time.time() - t0, 1)

    keys_file = os.path.join(
        work, "extracted_embedding", "bioscan_1m", "e2e_tpu_demo",
        "extracted_features_of_all_keys.hdf5",
    )
    assert os.path.exists(keys_file), keys_file

    # one-shot serving: a class-0 DNA barcode against the exported DNA keys
    rng = np.random.default_rng(0)
    query = {"dna": [make_barcode(0, rng)], "k": 3}
    qfile = os.path.join(work, "query.json")
    rfile = os.path.join(work, "response.json")
    with open(qfile, "w") as f:
        json.dump(query, f)

    from bioscan_clip_tpu.cli.serve import run as serve_run

    args3 = load_config(
        overrides=[
            "model_config=lora_vit_lora_barcode_bert_lora_bert_ssl",
            f"bioscan_data.path_to_hdf5_data={ds}",
            "model_config.model_output_name=e2e_tpu_demo",
        ] + ckpt_overrides + [
            f"serve.keys={keys_file}",
            "serve.feature_type=encoded_dna_feature",
            f"serve.once={qfile}",
            f"serve.output={rfile}",
        ],
        project_root_path=work,
    )
    t0 = time.time()
    serve_run(args3, out=out)
    record["phases"]["serve_once_s"] = round(time.time() - t0, 1)
    with open(rfile) as f:
        record["serve_response"] = json.load(f)

    record["total_s"] = round(sum(record["phases"].values()), 1)
    name = (
        "E2E_TINY.json" if os.environ.get("BSCAN_E2E_TINY")
        else "E2E_TPU_r03.json"
    )
    out_path = os.path.join(ROOT, name)
    with open(out_path, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record, indent=2))
    print(f"\nWrote {out_path}")


if __name__ == "__main__":
    main()
