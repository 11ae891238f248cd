"""Pipeline-fed END-TO-END benchmarks (VERDICT r3 next-step #1).

Unlike bench.py (device-rate: resident synthetic batches), every mode here
drives the REAL framework path — config -> HDF5 loader -> host decode ->
host->device transfer -> jit step — against a realistic BIOSCAN-shaped
fixture (tools/make_realistic_fixture.py: 768x512 JPEG bytes, 658-nt
barcodes), so the number is the SYSTEM rate a user gets from the CLIs.
Reference equivalents: scripts/train_cl.py:208-243 epochs over HDF5,
scripts/extract_embedding.py full-split extraction.

Modes (one JSON line each, appended to --out):
  --loader-only   iterate the train loader with no device work: the host
                  feed ceiling (decode+aug+batch assembly) in samples/s
  --train         bounded epoch through cli.train_cl.run() (the real CLI
                  entry) -> train_epoch's own samples/s
  --extract       full-split extraction via train.loop.extract_features
                  through the real eval loader (the extract_embedding path)

Usage:
  python tools/e2e_pipeline_bench.py --loader-only --steps 40
  python tools/e2e_pipeline_bench.py --train --steps 200 [--spc 32]
  python tools/e2e_pipeline_bench.py --extract --split val_seen [--parity]
"""

import faulthandler
import json
import os
import signal
import sys
import time

# kill -USR1 <pid> dumps every Python stack to stderr without killing the
# process — the e2e paths have wedged inside library code before (r4: the
# eval extraction after a bounded train epoch), and this is the only
# attach-free way to see where
faulthandler.register(signal.SIGUSR1)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

try:  # persistent XLA compilation cache (tunnel compiles are 20s-30min)
    from bioscan_clip_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
except Exception:
    pass


def _note(msg):
    print(f"[e2e {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)

FIXTURE = os.environ.get(
    "BSCAN_FIXTURE", "/tmp/bscan_fixture/realistic_1m.hdf5"
)
MODEL = "lora_vit_lora_barcode_bert_lora_bert_ssl"


def _flag(name, default, cast=int):
    if name not in sys.argv:
        return default
    i = sys.argv.index(name)
    if i + 1 >= len(sys.argv):
        sys.exit(f"{name} requires a value")
    return cast(sys.argv[i + 1])


def _base_overrides(batch):
    return [
        f"model_config={MODEL}",
        f"bioscan_data.path_to_hdf5_data={FIXTURE}",
        "bioscan_5m_data.path_to_hdf5_data=" + FIXTURE,
        f"model_config.batch_size={batch}",
        "model_config.epochs=1",
        "save_ckpt=false",
        "activate_wandb=false",
        "debug_flag=true",
        f"project_root_path=/tmp/e2e_bench_out",
    ]


def _emit(row, out_path):
    row["fixture"] = FIXTURE
    line = json.dumps(row)
    print(line, flush=True)
    if out_path:
        with open(out_path, "a") as f:
            f.write(line + "\n")


def loader_only(steps, batch, train_crop, out_path):
    """Host feed ceiling: the exact loader train_cl constructs, no device."""
    from bioscan_clip_tpu.config.core import load_config
    from bioscan_clip_tpu.data.dataset import load_dataloader

    ov = _base_overrides(batch) + [
        f"tpu.train_crop={'true' if train_crop else 'false'}",
    ]
    args = load_config(overrides=ov)
    train_loader, *_ = load_dataloader(args)
    it = iter(train_loader)
    # warmup: first 2 batches pay HDF5 open + native-pool spin-up
    for _ in range(2):
        next(it)
    t0 = time.perf_counter()
    n = 0
    per_batch = []
    for _ in range(steps):
        tb = time.perf_counter()
        b = next(it)
        per_batch.append(round(1e3 * (time.perf_counter() - tb), 1))
        key = "image_u8" if "image_u8" in b else "image"
        n += b[key].shape[0]
    dur = time.perf_counter() - t0
    _emit({
        "mode": "loader_only",
        "samples_per_s": round(n / dur, 1),
        "batch": batch,
        "steps": steps,
        "train_crop": train_crop,
        "ms_per_batch_p50": sorted(per_batch)[len(per_batch) // 2],
        "host_cores": os.cpu_count(),
    }, out_path)


def train_e2e(steps, batch, spc, train_crop, out_path):
    """Bounded train epoch through the REAL CLI entry (cli.train_cl.run).

    Champion single-chip recipe; --train-crop picks where the crop runs:
      false -> native C++ decode, full 768x512 uint8 shipped, device-side
               aug (the real-hardware path; through the sandbox tunnel the
               ~28 MB/batch transfer is the bottleneck at ~50 MB/s)
      true  -> host RandomResizedCrop, 224x224 uint8 shipped (3.6 MB/batch;
               trades tunnel bytes for 1-core host CPU)"""
    from bioscan_clip_tpu.cli.train_cl import run
    from bioscan_clip_tpu.config.core import load_config

    ov = _base_overrides(batch) + [
        f"tpu.steps_per_call={spc}",
        "tpu.remat=true",
        "tpu.remat_policy=dots",
        "tpu.rng_impl=rbg",
        "tpu.frozen_dtype=bfloat16",
        f"tpu.train_crop={'true' if train_crop else 'false'}",
        "tpu.eval_host_parity_resize=false",
        "model_config.evaluation_period=1000000",
    ]
    args = load_config(overrides=ov)
    lines = []

    def out(msg):
        print(msg, flush=True)
        _note(msg)  # stderr too: the queue pipes stdout to `tail -1`
        lines.append(str(msg))

    t0 = time.perf_counter()
    run(args, max_steps_per_epoch=steps, out=out, skip_final_eval=True)
    wall = time.perf_counter() - t0
    stats = [ln for ln in lines if ln.startswith("epoch 0:")]
    sps = float(stats[-1].split(":")[1].split("samples/s")[0]) if stats \
        else None
    steady = None
    if stats and "steady" in stats[-1]:
        steady = float(stats[-1].split("steady")[1].split("/s")[0])
    _emit({
        "mode": "train_e2e",
        "samples_per_s_incl_compile": sps,
        "samples_per_s": steady,
        "batch": batch,
        "steps": steps,
        "steps_per_call": spc,
        "wall_s_incl_setup": round(wall, 1),
        "train_crop": train_crop,
    }, out_path)


def transfer_probe(out_path):
    """Host->device bandwidth of this environment (through the tunnel in
    the sandbox; PCIe on real hardware) — the denominator for interpreting
    the e2e rates: a full-res uint8 train batch is ~28 MB, a host-cropped
    one 3.6 MB."""
    import jax
    import numpy as np

    dev = jax.devices()[0]
    rows = {}
    for mb in (4, 32, 128):
        x = np.random.randint(0, 255, (mb << 20,), dtype=np.uint8)
        jax.device_put(x[: 1 << 20], dev).block_until_ready()  # warm path
        t0 = time.perf_counter()
        jax.device_put(x, dev).block_until_ready()
        dt = time.perf_counter() - t0
        rows[f"h2d_{mb}mb_mb_per_s"] = round(mb / dt, 1)
    _emit({"mode": "transfer_probe", "device": str(dev), **rows}, out_path)


def extract_e2e(split, batch, parity, out_path, repeat=1):
    """Full-split tri-modal extraction through the real eval loader — the
    extract_embedding CLI path (it calls the same extract_features)."""
    import jax
    import jax.numpy as jnp

    from bioscan_clip_tpu.config.core import load_config
    from bioscan_clip_tpu.data.dataset import construct_dataloader
    from bioscan_clip_tpu.models.clip import (
        init_clip_params, load_clip_model, maybe_merge_lora,
    )
    from bioscan_clip_tpu.parallel.mesh import create_mesh
    from bioscan_clip_tpu.train.loop import extract_features

    ov = _base_overrides(batch) + [
        "tpu.eval_host_parity_resize=" + ("true" if parity else "false"),
        "tpu.merge_lora=true",
    ]
    args = load_config(overrides=ov)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    _note("config loaded; building model")
    model = load_clip_model(args, dtype=dtype)
    params = init_clip_params(model, jax.random.PRNGKey(0))
    model, params = maybe_merge_lora(args, model, params, dtype=dtype)
    _note("model ready; constructing eval loader")
    loader = construct_dataloader(args, split)
    n = len(loader.reader)
    _note(f"extracting {n} records in batches of {batch}")
    marks = []  # (batch index, elapsed) from extract_features' progress

    def _progress(i, t):
        marks.append((i, t))
        _note(f"batch {i} starts at {t:.1f}s")

    mesh = create_mesh()
    first_pass_s = None
    for r in range(repeat):
        marks[:] = []  # per-pass marks: steady must use ONE timeline
        t0 = time.perf_counter()
        split_dict = extract_features(
            params, model, mesh, loader, progress=_progress,
        )
        dur = time.perf_counter() - t0
        if r == 0:
            first_pass_s = dur  # carries the jumbo-group compile
    assert split_dict["encoded_image_feature"].shape[0] == n
    # steady rate: batches after the first 3 (tower compiles land in the
    # first batches), measured to the end of the run
    steady = None
    if len(marks) > 4:
        i0, ts = marks[3]
        steady = round((n - i0 * batch) / (dur - ts), 1)
    row = {
        "mode": "extract_e2e",
        "samples_per_s": round(n / dur, 1),
        "samples_per_s_steady": steady,
        "split": split,
        "records": n,
        "batch": batch,
        "eval_host_parity_resize": parity,
        "wall_s": round(dur, 1),
    }
    if repeat > 1:
        # warm rate: the LAST pass — jit cache hot, so this is the
        # system rate a real multi-split/periodic-eval run sustains
        row["first_pass_wall_s"] = round(first_pass_s, 1)
        row["passes"] = repeat
    _emit(row, out_path)


if __name__ == "__main__":
    out_path = _flag("--out", "BENCH_E2E_r04.jsonl", cast=str)
    batch = _flag("--batch", 24)
    if "--loader-only" in sys.argv:
        loader_only(_flag("--steps", 40), batch,
                    "--train-crop" in sys.argv, out_path)
    elif "--train" in sys.argv:
        train_e2e(_flag("--steps", 200), batch, _flag("--spc", 32),
                  "--train-crop" in sys.argv, out_path)
    elif "--transfer-probe" in sys.argv:
        transfer_probe(out_path)
    elif "--extract" in sys.argv:
        extract_e2e(_flag("--split", "val_seen", cast=str),
                    _flag("--batch", 24), "--parity" in sys.argv, out_path,
                    repeat=_flag("--repeat", 1))
    else:
        sys.exit(__doc__)
    # results are emitted; if interpreter shutdown wedges (stray non-daemon
    # thread in a dependency), dump every stack to stderr and hard-exit
    # instead of eating the caller's timeout
    import faulthandler

    faulthandler.dump_traceback_later(60, exit=True)
