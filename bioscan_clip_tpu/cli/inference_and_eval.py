"""Retrieval evaluation CLI — the reference's scripts/inference_and_eval.py.

Flow (parity with inference_and_eval.py:786-894): resolve best/last ckpt,
embedding cache (extracted_feature_from_{split}_split.hdf5 + labels json,
short-circuited by load_inference), 9-split loaders, tri-modal feature
extraction, full query x key sweep, report files.
"""

from __future__ import annotations

import json
import os
import sys

import h5py

FEATURE_TYPES = [
    "encoded_image_feature",
    "encoded_dna_feature",
    "encoded_language_feature",
    "averaged_feature",
    "concatenated_feature",
    "all_key_features",
]


def save_feature_cache(path, labels_path, seen, unseen, keys):
    with h5py.File(path, "w") as f:
        for name, split in (("seen", seen), ("unseen", unseen), ("key", keys)):
            g = f.create_group(name)
            for ft in FEATURE_TYPES:
                if split.get(ft) is not None:
                    g.create_dataset(ft, data=split[ft])
    with open(labels_path, "w") as fp:
        json.dump(
            {
                "seen_gt_dict": seen["label_list"],
                "unseen_gt_dict": unseen["label_list"],
                "key_gt_dict": keys["label_list"],
            },
            fp,
            indent=4,
        )


def load_feature_cache(path, labels_path):
    seen, unseen, keys = {}, {}, {}
    with h5py.File(path, "r") as f:
        for name, split in (("seen", seen), ("unseen", unseen), ("key", keys)):
            for ft in FEATURE_TYPES:
                if ft in f[name]:
                    split[ft] = f[name][ft][:]
    with open(labels_path) as fp:
        total = json.load(fp)
    seen["label_list"] = total["seen_gt_dict"]
    unseen["label_list"] = total["unseen_gt_dict"]
    keys["label_list"] = total["key_gt_dict"]
    keys["all_key_features_label"] = total["key_gt_dict"] * 3
    return seen, unseen, keys


def run(args, out=print):
    import jax
    import jax.numpy as jnp

    from bioscan_clip_tpu.data.dataset import (
        load_bioscan_dataloader_all_small_splits,
    )
    from bioscan_clip_tpu.models.clip import (
        init_clip_params,
        load_clip_model,
        maybe_merge_lora,
    )
    from bioscan_clip_tpu.parallel.mesh import create_mesh
    from bioscan_clip_tpu.retrieval.report import inference_and_print_result
    from bioscan_clip_tpu.train.checkpoint import (
        load_pth_into_params,
        resolve_reference_ckpt,
    )
    from bioscan_clip_tpu.train.loop import extract_features

    args.save_inference = True
    mc = args.model_config

    # best.pth -> last.pth resolution (inference_and_eval.py:789-792)
    ckpt_path = getattr(mc, "ckpt_path", None)
    if ckpt_path and os.path.isdir(ckpt_path):
        resolved = resolve_reference_ckpt(ckpt_path)
        if resolved:
            mc.ckpt_path = resolved

    eval_on = args.inference_and_eval_setting.eval_on
    folder = os.path.join(
        args.project_root_path, "extracted_embedding", mc.dataset,
        mc.model_output_name,
    )
    os.makedirs(folder, exist_ok=True)
    feats_path = os.path.join(
        folder, f"extracted_feature_from_{eval_on}_split.hdf5"
    )
    labels_path = os.path.join(folder, f"labels_{eval_on}.json")

    if (
        os.path.exists(feats_path)
        and os.path.exists(labels_path)
        and getattr(args, "load_inference", False)
    ):
        out("Loading embeddings from file...")
        seen_dict, unseen_dict, keys_dict = load_feature_cache(
            feats_path, labels_path
        )
        mesh = create_mesh()
    else:
        out("Initialize model...")
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        model = load_clip_model(args, dtype=dtype)
        params = init_clip_params(model, jax.random.PRNGKey(0))
        if getattr(mc, "load_ckpt", True):
            if mc.ckpt_path and os.path.isfile(mc.ckpt_path):
                params = load_pth_into_params(
                    mc.ckpt_path, params, mc.output_dim
                )
                out(f"Loaded {mc.ckpt_path}")
        model, params = maybe_merge_lora(args, model, params, dtype=dtype)

        mc.batch_size = 24  # (inference_and_eval.py:846)
        loaders = load_bioscan_dataloader_all_small_splits(args)
        (_, seen_val, unseen_val, seen_test, unseen_test, *_rest,
         all_keys) = loaders
        if eval_on == "val":
            seen_loader, unseen_loader = seen_val, unseen_val
        elif eval_on == "test":
            seen_loader, unseen_loader = seen_test, unseen_test
        else:
            raise ValueError(
                "Invalid value for eval_on; use "
                "'inference_and_eval_setting.eval_on=val' or '=test'"
            )

        mesh = create_mesh()
        keys_dict = extract_features(
            params, model, mesh, all_keys, for_key_set=True
        )
        seen_dict = extract_features(params, model, mesh, seen_loader)
        unseen_dict = extract_features(params, model, mesh, unseen_loader)
        if args.save_inference:
            save_feature_cache(
                feats_path, labels_path, seen_dict, unseen_dict, keys_dict
            )
            out(f"Saved feature cache to {feats_path}")

    return inference_and_print_result(
        keys_dict, seen_dict, unseen_dict, args=args,
        k_list=list(args.inference_and_eval_setting.k_list), mesh=mesh,
        out=out,
    )


def main(argv=None):
    from bioscan_clip_tpu.config.core import load_config

    argv = argv if argv is not None else sys.argv[1:]
    args = load_config(overrides=list(argv))
    return run(args)


if __name__ == "__main__":
    main()
