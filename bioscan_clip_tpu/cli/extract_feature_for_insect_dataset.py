"""INSECT all-split embedding extraction -> BZSL CSVs.

Parity with scripts/extract_feature_for_insect_dataset.py (single process —
the reference spawns one copy per GPU doing identical rank-independent
work, :92-96; here one process drives the mesh).
"""

from __future__ import annotations

import os
import sys


def run(args, out=print):
    import jax
    import jax.numpy as jnp

    from bioscan_clip_tpu.data.insect import load_insect_dataloader
    from bioscan_clip_tpu.models.clip import (
        init_clip_params,
        load_clip_model,
        maybe_merge_lora,
    )
    from bioscan_clip_tpu.parallel.mesh import create_mesh
    from bioscan_clip_tpu.retrieval.bzsl import (
        export_bzsl_csvs,
        res101_class_labels,
    )
    from bioscan_clip_tpu.train.checkpoint import load_pth_into_params
    from bioscan_clip_tpu.train.loop import extract_features

    mc = args.model_config
    mc.batch_size = 200  # (extract_feature_for_insect_dataset.py:21)

    out("Construct dataloader...")
    all_loader = load_insect_dataloader(args, load_all_in_one=True)

    out("Initialize model...")
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = load_clip_model(args, dtype=dtype)
    params = init_clip_params(model, jax.random.PRNGKey(0))
    ckpt = os.path.join(
        mc.ckpt_trained_with_insect_image_dna_text_path, "best.pth"
    )
    if os.path.isfile(ckpt):
        params = load_pth_into_params(ckpt, params, mc.output_dim)
        out(f"Loaded {ckpt}")
    model, params = maybe_merge_lora(args, model, params, dtype=dtype)

    mesh = create_mesh()
    feats = extract_features(params, model, mesh, all_loader)

    folder = os.path.join(args.project_root_path, "extracted_embedding/INSECT")
    labels = res101_class_labels(args.insect_data.path_to_res_101_mat)
    export_bzsl_csvs(
        folder, feats["encoded_dna_feature"], feats["encoded_image_feature"],
        labels, out=out,
    )


def main(argv=None):
    from bioscan_clip_tpu.config.core import load_config

    args = load_config(
        overrides=list(argv if argv is not None else sys.argv[1:])
    )
    return run(args)


if __name__ == "__main__":
    main()
