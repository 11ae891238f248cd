"""Per-split embedding export CLI — the reference's scripts/extract_embedding.py.

Writes `extracted_features_of_{split}.hdf5` per split with the 4 taxonomy
label lists, ids, and the three per-modality feature datasets
(extract_embedding.py:145-183).
"""

from __future__ import annotations

import os
import sys

import h5py
import numpy as np

SPLIT_NAMES = [
    "train_seen", "val_seen", "val_unseen", "test_seen", "test_unseen",
    "seen_keys", "val_unseen_keys", "test_unseen_keys", "all_keys",
]


def write_split_features(path, split_dict):
    with h5py.File(path, "w") as f:
        str_dt = h5py.string_dtype()
        labels = split_dict["label_list"]
        for lvl in ("order", "family", "genus", "species"):
            f.create_dataset(
                lvl,
                data=np.array([l[lvl] for l in labels], dtype=object),
                dtype=str_dt,
            )
        if split_dict.get("file_name_list"):
            f.create_dataset(
                "file_name_list",
                data=np.array(split_dict["file_name_list"], dtype=object),
                dtype=str_dt,
            )
        for ft in (
            "encoded_image_feature",
            "encoded_dna_feature",
            "encoded_language_feature",
        ):
            if split_dict.get(ft) is not None:
                f.create_dataset(ft, data=split_dict[ft])


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
    from bioscan_clip_tpu.train.checkpoint import (
        load_pth_into_params,
        resolve_reference_ckpt,
    )
    from bioscan_clip_tpu.train.loop import extract_features

    mc = args.model_config
    ckpt_path = getattr(mc, "ckpt_path", None)
    if ckpt_path and os.path.isdir(ckpt_path):
        resolved = resolve_reference_ckpt(ckpt_path)
        if resolved:
            mc.ckpt_path = resolved

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = load_clip_model(args, dtype=dtype)
    params = init_clip_params(model, jax.random.PRNGKey(0))
    if getattr(mc, "load_ckpt", True) and mc.ckpt_path and os.path.isfile(
        mc.ckpt_path
    ):
        params = load_pth_into_params(mc.ckpt_path, params, mc.output_dim)
        out(f"Loaded {mc.ckpt_path}")
    model, params = maybe_merge_lora(args, model, params, dtype=dtype)

    mc.batch_size = 24
    loaders = load_bioscan_dataloader_all_small_splits(args)
    mesh = create_mesh()

    folder = os.path.join(
        args.project_root_path, "extracted_embedding", mc.dataset,
        mc.model_output_name,
    )
    os.makedirs(folder, exist_ok=True)
    for name, loader in zip(SPLIT_NAMES, loaders):
        split_dict = extract_features(params, model, mesh, loader)
        path = os.path.join(folder, f"extracted_features_of_{name}.hdf5")
        write_split_features(path, split_dict)
        out(f"Wrote {path}")


def main(argv=None):
    from bioscan_clip_tpu.config.core import load_config

    args = load_config(
        overrides=list(argv if argv is not None else sys.argv[1:])
    )
    return run(args)


if __name__ == "__main__":
    main()
