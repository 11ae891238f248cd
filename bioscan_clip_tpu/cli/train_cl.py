"""Contrastive pretraining CLI — the reference's scripts/train_cl.py on TPU.

Usage (reference-compatible override syntax, README.md:129):
    python -m bioscan_clip_tpu.cli.train_cl 'model_config=NAME' [key=value...]

Differences from the reference by design (SURVEY.md §2.8, §5):
- one process drives the whole mesh (no mp.spawn/NCCL/port management);
  gradients are synchronized BY CONSTRUCTION (the reference's default path
  never all-reduced them);
- the global-batch gathered InfoNCE is always on (ClipLoss semantics);
- orbax checkpoints carry full train state (params+opt+step) and resume.
"""

from __future__ import annotations

import datetime
import os
import sys

import jax


def run(args, max_steps_per_epoch=None, out=print, skip_final_eval=False):
    import jax.numpy as jnp

    from bioscan_clip_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # multi-host: one JAX process per host (the reference's mp.spawn+NCCL
    # story, train_cl.py:249-252) — see parallel/distributed.py triggers.
    # Each process's loaders read a process-strided shard of every batch
    # (DistributedSampler(drop_last) semantics) and shard_batch assembles
    # the global arrays.
    from bioscan_clip_tpu.parallel.distributed import (
        maybe_initialize_distributed,
    )

    proc_idx, proc_cnt = maybe_initialize_distributed(args, log=out)

    from bioscan_clip_tpu.data.dataset import load_dataloader
    from bioscan_clip_tpu.models.clip import init_clip_params, load_clip_model
    from bioscan_clip_tpu.parallel.mesh import create_mesh
    from bioscan_clip_tpu.retrieval.report import inference_and_print_result
    from bioscan_clip_tpu.train.checkpoint import (
        load_pretrained_towers,
        load_pth_into_params,
        restore_checkpoint,
        save_checkpoint,
    )
    from bioscan_clip_tpu.train.loop import (
        extract_features,
        make_train_step,
        train_epoch,
    )
    from bioscan_clip_tpu.train.schedules import build_schedule
    from bioscan_clip_tpu.train.state import create_train_state
    from bioscan_clip_tpu.utils.logging import WandbRun

    mc = args.model_config
    # tpu.fast_ln: bf16 LayerNorm normalize/output with f32 statistics
    # (flax always keeps LN mean/var reductions in f32). The reference
    # trains pure fp32, so this sits in the same compute-dtype deviation
    # class as the rest of bf16 training; tests/test_fast_ln.py bounds the
    # embedding drift and the loss-trajectory drift. Env wins if already
    # set (the bench A/Bs use the env knob directly).
    _tpu_pre = getattr(args, "tpu", None)
    if _tpu_pre and bool(_tpu_pre.get("fast_ln", False)):
        os.environ.setdefault("BSCAN_FAST_LN", "1")
    if args.debug_flag:
        args.activate_wandb = False
        args.save_inference = False
        args.save_ckpt = False

    out("Construct dataloader...")
    insect_mode = getattr(mc, "dataset", None) == "INSECT"
    if insect_mode:
        from bioscan_clip_tpu.data.insect import load_insect_dataloader

        (train_loader, train_for_key, val_loader, test_seen_loader,
         test_unseen_loader) = load_insect_dataloader(
            args, process_index=proc_idx, process_count=proc_cnt
        )
        eval_loaders = (train_for_key, val_loader, test_seen_loader,
                        test_unseen_loader)
    else:
        train_loader, seen_val, unseen_val, all_keys = load_dataloader(
            args, process_index=proc_idx, process_count=proc_cnt
        )
        eval_loaders = (all_keys, seen_val, unseen_val)

    out("Initialize model...")
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = load_clip_model(args, dtype=dtype)
    params = init_clip_params(model, jax.random.PRNGKey(0))
    if getattr(mc, "load_ckpt", True):
        ckpt = getattr(mc, "ckpt_path", None)
        if ckpt and os.path.isfile(ckpt):
            params = load_pth_into_params(ckpt, params, mc.output_dim)
            out(f"Loaded checkpoint {ckpt}")
        else:
            params = load_pretrained_towers(args, params, mc.output_dim, log=out)

    if bool(getattr(mc, "learnable_logit_scale", False)):
        # optional CLIP-style learnable temperature (parity-plus: the
        # reference is fixed 1/0.07, train_cl.py:190)
        from bioscan_clip_tpu.train.loop import make_logit_scale_param

        params = make_logit_scale_param(params)
        out("learnable logit scale enabled (init 1/0.07)")

    # tpu.max_steps_per_epoch=N bounds every epoch to N optimizer steps —
    # the CLI-reachable form of the run() kwarg (bounded on-chip epochs
    # over real data without editing code; 0/absent = full epochs).
    _tpu_pre = getattr(args, "tpu", None)
    if not max_steps_per_epoch and _tpu_pre:
        max_steps_per_epoch = int(_tpu_pre.get("max_steps_per_epoch", 0)) or None

    steps_per_epoch = len(train_loader)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    total_steps = steps_per_epoch * mc.epochs
    schedule = build_schedule(mc, total_steps)
    disable_lora = bool(getattr(mc, "disable_lora", False))

    # tpu.frozen_dtype=bfloat16: store the frozen (non-LN) tower weights in
    # bf16 — bit-identical under bf16 compute (the towers cast per use), but
    # halves the resident frozen-tree footprint and weight HBM reads
    # (train/state.py cast_frozen_params). Skipped under fp32 compute, where
    # it would change numerics.
    _tpu = getattr(args, "tpu", None)
    frozen_dtype = str(_tpu.get("frozen_dtype", "") if _tpu else "")
    if frozen_dtype in ("bfloat16", "bf16") and dtype == jnp.bfloat16:
        from bioscan_clip_tpu.train.state import cast_frozen_params

        params = cast_frozen_params(params, disable_lora=disable_lora)
        out("frozen params stored in bfloat16")

    state = create_train_state(model, params, schedule, disable_lora=disable_lora)

    mesh = create_mesh(getattr(args, "tpu", {}).get("mesh_shape")
                       if hasattr(args, "tpu") else None)

    # mid-run resume (SURVEY.md §5.4 upgrade; the reference has none):
    # `resume=<ckpt folder>` restores params+opt+step from <folder>/last and
    # continues at the next epoch boundary.
    resume_dir = getattr(args, "resume", None)
    start_epoch = 0
    if resume_dir:
        state = restore_checkpoint(str(resume_dir), state, name="last",
                                   mesh=mesh)
        start_epoch = int(state.step) // max(steps_per_epoch, 1)
        out(f"Resumed from {resume_dir}/last at step {int(state.step)} "
            f"(epoch {start_epoch})")
    tpu_cfg = getattr(args, "tpu", None)
    accum = int(tpu_cfg.get("accum_steps", 1)) if tpu_cfg else 1
    if accum > 1:
        # single-chip memory relief. Default: GradCache — full-batch
        # InfoNCE negatives, exact full-batch gradients (the reference's
        # batch-400 ClipLoss semantics). accum_mode=micro falls back to
        # per-microbatch negatives (reference per-rank ContrastiveLoss).
        mode = str(tpu_cfg.get("accum_mode", "gradcache")) if tpu_cfg else "gradcache"
        # tpu.gradcache_merged (default true): GradCache's no-grad stage-1
        # embedding pass runs with the LoRA adapters folded into the
        # projection kernels (rank-0 towers; merged forward measured +9%,
        # PERF_NOTES) — stage 3's VJP keeps the adapter form
        gc_merged = (
            bool(tpu_cfg.get("gradcache_merged", True)) if tpu_cfg else True
        )
        merged_model = None
        if mode != "micro" and gc_merged and not disable_lora:
            merged_model = load_clip_model(args, dtype=dtype, lora_rank=0)
        # tpu.gc_s1_image_batch: stage-1 image embeddings in big-batch
        # chunks (the ViT tower is dropout-free -> exact; see
        # make_gradcache_train_step). tpu.gc_cache_aug: stage 3 reuses
        # stage 1's augmented images instead of recomputing the
        # bit-identical transform.
        gc_s1_img = int(tpu_cfg.get("gc_s1_image_batch", 0)) if tpu_cfg else 0
        gc_cache_aug = (
            bool(tpu_cfg.get("gc_cache_aug", False)) if tpu_cfg else False
        )
        # tpu.gc_s1_chunk: stage 1 embeds ALL towers in big-batch chunks
        # under batch-composition-invariant (row-keyed) dropout — stage 3's
        # per-microbatch recompute reproduces the same masks exactly
        # (make_gradcache_train_step docstring)
        gc_s1_chunk = int(tpu_cfg.get("gc_s1_chunk", 0)) if tpu_cfg else 0
        if mode == "micro":
            from bioscan_clip_tpu.train.loop import make_accum_train_step

            train_step = make_accum_train_step(
                model, mesh, accum_steps=accum,
                openclip_norm=bool(getattr(mc, "for_open_clip", False)),
                disable_lora=disable_lora, color_jitter=insect_mode,
            )
        else:
            from bioscan_clip_tpu.train.loop import make_gradcache_train_step

            train_step = make_gradcache_train_step(
                model, mesh, accum_steps=accum,
                openclip_norm=bool(getattr(mc, "for_open_clip", False)),
                disable_lora=disable_lora, color_jitter=insect_mode,
                merged_model=merged_model,
                s1_image_batch=gc_s1_img, cache_aug=gc_cache_aug,
                s1_chunk=gc_s1_chunk,
            )
    else:
        # INSECT train transform appends ColorJitter(0.5 x4)
        # (dataset_for_insect_dataset.py:116-118)
        train_step = make_train_step(
            model, mesh,
            openclip_norm=bool(getattr(mc, "for_open_clip", False)),
            disable_lora=disable_lora, color_jitter=insect_mode,
        )

    # tpu.steps_per_call=K: run K steps per device dispatch via lax.scan —
    # identical per-step semantics, K-fold fewer host round-trips. Composes
    # with tpu.accum_steps: the scan body is then one full GradCache
    # macro-step (full-batch negatives AND dispatch amortization — the
    # batch-400 single-chip recipe). accum_mode=micro has no scan path.
    steps_per_call = int(tpu_cfg.get("steps_per_call", 1)) if tpu_cfg else 1
    scan_factory = None
    if steps_per_call > 1 and accum == 1:
        from bioscan_clip_tpu.train.loop import make_scan_train_step

        def scan_factory(k):
            return make_scan_train_step(
                model, mesh, steps_per_call=k,
                openclip_norm=bool(getattr(mc, "for_open_clip", False)),
                disable_lora=disable_lora, color_jitter=insect_mode,
            )
    elif steps_per_call > 1 and accum > 1 and mode != "micro":
        from bioscan_clip_tpu.train.loop import make_gradcache_train_step

        def scan_factory(k):
            return make_gradcache_train_step(
                model, mesh, accum_steps=accum, steps_per_call=k,
                openclip_norm=bool(getattr(mc, "for_open_clip", False)),
                disable_lora=disable_lora, color_jitter=insect_mode,
                merged_model=merged_model,
                s1_image_batch=gc_s1_img, cache_aug=gc_cache_aug,
                s1_chunk=gc_s1_chunk,
            )
    else:
        steps_per_call = 1

    wandb_run = WandbRun(
        getattr(mc, "wandb_project_name", "BIOSCAN-CLIP-TPU"),
        getattr(mc, "model_output_name", "run"),
        activate=bool(getattr(args, "activate_wandb", False)),
    )

    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H%M%S")
    folder = os.path.join(
        args.project_root_path, args.model_output_dir,
        mc.model_output_name, stamp,
    )
    if args.save_ckpt:
        os.makedirs(folder, exist_ok=True)
        from bioscan_clip_tpu.config.core import save_config

        save_config(args, os.path.join(folder, "config.yaml"))

    best_acc = None
    best_epoch = None
    # tpu.rng_impl=rbg: TPU-native RBG PRNG for the dropout/aug streams
    # (~20 ms/step cheaper than threefry on the flagship at B=128,
    # PERF_NOTES round 3). Default threefry: deterministic across backends.
    rng_impl = (str(tpu_cfg.get("rng_impl", "threefry2x32"))
                if tpu_cfg else "threefry2x32")
    rng = jax.random.key(42, impl=rng_impl)
    k_list = [1, 3, 5]
    profile_dir = getattr(args, "profile_dir", None)
    out("training...")
    for epoch in range(start_epoch, mc.epochs):
        loader = train_loader
        bounded_gen = None
        if max_steps_per_epoch:
            import itertools

            # keep the raw generator so it can be CLOSED after the bounded
            # epoch: islice abandons it mid-epoch, leaving the loader's
            # prefetch producer thread alive and competing with the eval
            # phase for host cores (r4: eval extraction after a bounded
            # epoch crawled partly for this reason)
            bounded_gen = iter(train_loader)
            loader = itertools.islice(bounded_gen, max_steps_per_epoch)
        state, stats = train_epoch(
            state, train_step, loader, mesh, rng, epoch, mc.epochs,
            logger=out, wandb_run=wandb_run,
            profile_dir=profile_dir if epoch == start_epoch else None,
            profile_steps=int(getattr(args, "profile_steps", 5)),
            steps_per_call=steps_per_call,
            scan_step_factory=scan_factory,
        )
        if bounded_gen is not None:
            bounded_gen.close()  # cancels the prefetch producer thread
        out(
            f"epoch {epoch}: {stats['samples_per_s']:.1f} samples/s, "
            f"{stats['epoch_time_s']:.1f}s"
            + (
                f" (steady {stats['samples_per_s_steady']:.1f}/s "
                "post-compile)"
                if "samples_per_s_steady" in stats else ""
            )
        )

        # `epoch == epochs-1` makes the final epoch ALWAYS evaluate (the
        # reference's behavior); skip_final_eval exists for bounded bench
        # runs (tools/e2e_pipeline_bench.py) where a 1-epoch run would
        # otherwise pay the full retrieval eval after the timed epoch
        eval_now = not skip_final_eval and (
            epoch % mc.evaluation_period == 0 or epoch == mc.epochs - 1
        )
        if not eval_now:
            continue
        if args.save_ckpt:
            # async: the eval phase below runs while `last` hits disk
            save_checkpoint(folder, state, name="last", block=False)
            out(f"Last ckpt: {folder}/last")
        # multi-host eval: every process evaluates the FULL splits on its
        # process-LOCAL devices (the loaders are unsharded for eval) — the
        # reference's rank-0 eval semantics without idling the other hosts'
        # feature extraction.
        # tpu.extract_group: dispatch-amortized extraction (train/loop.py
        # _extract_features_grouped); -1 = backend auto-default
        _eg = int(tpu_cfg.get("extract_group", -1)) if tpu_cfg else -1
        eg = None if _eg < 0 else _eg
        eval_mesh, eval_params = mesh, state.params
        if proc_cnt > 1:
            import numpy as np

            from bioscan_clip_tpu.parallel.mesh import create_mesh as _cm

            eval_mesh = _cm(devices=jax.local_devices())
            eval_params = jax.tree.map(np.asarray, state.params)
        if insect_mode:
            # eval_phase_for_insect (train_cl.py:85-101): keys = merged
            # train/val/test splits, queries = test seen/unseen
            from bioscan_clip_tpu.retrieval.report import construct_key_dict

            train_key, val_loader, test_seen_l, test_unseen_l = eval_loaders
            dicts = [
                extract_features(eval_params, model, eval_mesh, l,
                                 group_samples=eg)
                for l in (train_key, val_loader, test_seen_l, test_unseen_l)
            ]
            keys_dict = construct_key_dict(dicts)
            seen_dict, unseen_dict = dicts[2], dicts[3]
        else:
            all_keys, seen_val, unseen_val = eval_loaders
            keys_dict = extract_features(
                eval_params, model, eval_mesh, all_keys, for_key_set=True,
                group_samples=eg,
            )
            seen_dict = extract_features(
                eval_params, model, eval_mesh, seen_val, group_samples=eg
            )
            unseen_dict = extract_features(
                eval_params, model, eval_mesh, unseen_val, group_samples=eg
            )
        acc_dict, _, _ = inference_and_print_result(
            keys_dict, seen_dict, unseen_dict, args=args, k_list=k_list,
            mesh=eval_mesh, out=out,
        )
        # model selection: mean of seen/unseen image->image top-1 species
        # micro acc (train_cl.py:231)
        try:
            e = acc_dict["encoded_image_feature"]["encoded_image_feature"]
            overall = (
                e["seen"]["micro_acc"][1]["species"]
                + e["unseen"]["micro_acc"][1]["species"]
            ) / 2
        except KeyError:
            overall = 0.0
        if best_acc is None or overall > best_acc:
            best_acc, best_epoch = overall, epoch
            if args.save_ckpt:
                save_checkpoint(folder, state, name="best")
                out(f"Best ckpt: {folder}/best")
        wandb_run.log(
            {"overall_acc": overall, "best_epoch": best_epoch, "epoch": epoch}
        )
    wandb_run.finish()
    from bioscan_clip_tpu.train.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()
    return state, best_acc


def main(argv=None):
    from bioscan_clip_tpu.config.core import load_config

    argv = argv if argv is not None else sys.argv[1:]
    args = load_config(overrides=list(argv))
    return run(args)


if __name__ == "__main__":
    main()
