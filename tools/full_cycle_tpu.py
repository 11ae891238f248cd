"""Full train->eval->checkpoint->resume cycle ON CHIP (VERDICT r4 #1).

Runs the REAL cli.train_cl.run against the realistic fixture with
checkpointing and the in-loop eval phase ENABLED (the r4 runs disabled
eval after a wedge that aff459b/5de9a9f root-caused to the abandoned
bounded-epoch prefetch producer + per-batch extraction dispatch):

  phase A: bounded epoch (tpu.max_steps_per_epoch) -> eval_phase
           (grouped extraction of all_keys/val_seen/val_unseen -> retrieval
           sweep -> logs/accuracy.json) -> best/last orbax checkpoints
  phase B: resume=<folder> with epochs=2 -> verifies the restored step
           counter continues exactly at phase A's boundary, trains the
           second epoch, evaluates again

Emits ONE JSON line with phase timings, the system-produced species
top-1 image->image micro accuracies, and the resume step check.
Reference composite: scripts/train_cl.py:208-243.

    python tools/full_cycle_tpu.py [--steps 40] [--batch 24] [--out F]
"""

from __future__ import annotations

import faulthandler
import glob
import json
import os
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bioscan_clip_tpu.utils.cache import enable_compilation_cache  # noqa

enable_compilation_cache()

FIXTURE = os.environ.get(
    "BSCAN_FIXTURE", "/tmp/bscan_fixture/realistic_1m.hdf5"
)
MODEL = "lora_vit_lora_barcode_bert_lora_bert_ssl"
WORKDIR = "/tmp/full_cycle"


def _flag(name, default, cast=int):
    if name not in sys.argv:
        return default
    return cast(sys.argv[sys.argv.index(name) + 1])


def _note(msg):
    print(f"[cycle {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def overrides(steps, batch, epochs, spc, extra=()):
    return [
        f"model_config={MODEL}",
        f"bioscan_data.path_to_hdf5_data={FIXTURE}",
        f"bioscan_5m_data.path_to_hdf5_data={FIXTURE}",
        f"model_config.batch_size={batch}",
        f"model_config.epochs={epochs}",
        "model_config.evaluation_period=1",
        "debug_flag=false",
        "activate_wandb=false",
        "save_ckpt=true",
        "save_inference=true",
        f"project_root_path={WORKDIR}",
        f"tpu.max_steps_per_epoch={steps}",
        f"tpu.steps_per_call={spc}",
        "tpu.remat=true",
        "tpu.remat_policy=dots",
        "tpu.rng_impl=rbg",
        "tpu.frozen_dtype=bfloat16",
        "tpu.eval_host_parity_resize=false",
        *extra,
    ]


def species_top1(acc_path):
    try:
        with open(acc_path) as f:
            acc = json.load(f)
        e = acc["encoded_image_feature"]["encoded_image_feature"]
        return {
            "seen_species_top1": e["seen"]["micro_acc"]["1"]["species"],
            "unseen_species_top1": e["unseen"]["micro_acc"]["1"]["species"],
        }
    except Exception as exc:
        return {"acc_parse_error": str(exc)[:120]}


def main():
    from bioscan_clip_tpu.cli.train_cl import run
    from bioscan_clip_tpu.config.core import load_config

    steps = _flag("--steps", 40)
    batch = _flag("--batch", 24)
    spc = _flag("--spc", 8)
    out_path = _flag("--out", os.path.join(ROOT, "CYCLE_r05.json"), cast=str)

    os.makedirs(WORKDIR, exist_ok=True)
    os.chdir(WORKDIR)  # logs/accuracy.json lands here

    lines = []

    def out(msg):
        print(msg, flush=True)
        _note(msg)
        lines.append(str(msg))

    result = {"mode": "full_cycle", "fixture": FIXTURE, "steps": steps,
              "batch": batch, "spc": spc}

    # ---- phase A: train 1 bounded epoch + eval + ckpt ----
    args = load_config(overrides=overrides(steps, batch, epochs=1, spc=spc))
    t0 = time.perf_counter()
    state, best_acc = run(args, out=out)
    result["phase_a_wall_s"] = round(time.perf_counter() - t0, 1)
    result["phase_a_final_step"] = int(state.step)
    result["phase_a_best_acc"] = best_acc
    acc_json = os.path.join(WORKDIR, "logs", "accuracy.json")
    result["accuracy_json"] = acc_json if os.path.isfile(acc_json) else None
    result.update(species_top1(acc_json))

    # the checkpoint folder run() created (newest stamp)
    pat = os.path.join(WORKDIR, args.model_output_dir,
                       args.model_config.model_output_name, "*")
    folders = sorted(glob.glob(pat))
    if not folders:
        result["error"] = "no checkpoint folder created"
        _emit(result, out_path)
        return
    folder = folders[-1]
    result["ckpt_folder"] = folder
    result["has_last"] = os.path.isdir(os.path.join(folder, "last"))
    result["has_best"] = os.path.isdir(os.path.join(folder, "best"))

    # ---- phase B: resume, train epoch 2, eval again ----
    args2 = load_config(overrides=overrides(
        steps, batch, epochs=2, spc=spc, extra=[f"resume={folder}"]))
    t0 = time.perf_counter()
    n_before = len(lines)
    state2, best2 = run(args2, out=out)
    result["phase_b_wall_s"] = round(time.perf_counter() - t0, 1)
    result["phase_b_final_step"] = int(state2.step)
    resumed = [ln for ln in lines[n_before:] if ln.startswith("Resumed")]
    result["resume_line"] = resumed[0] if resumed else None
    result["resume_step_ok"] = (
        bool(resumed) and f"at step {steps} " in resumed[0]
        and int(state2.step) == 2 * steps
    )
    result["phase_b_best_acc"] = best2
    acc2 = species_top1(acc_json)
    result["epoch2_" + "seen_species_top1"] = acc2.get("seen_species_top1")
    result["epoch2_" + "unseen_species_top1"] = acc2.get(
        "unseen_species_top1")
    result["ok"] = bool(result.get("resume_step_ok")) and \
        result["accuracy_json"] is not None
    _emit(result, out_path)


def _emit(row, out_path):
    line = json.dumps(row)
    print(line, flush=True)
    with open(out_path, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
    faulthandler.dump_traceback_later(60, exit=True)
