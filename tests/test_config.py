"""Config system tests: composition, interpolation, overrides, hasattr probing."""

import os

import pytest

from bioscan_clip_tpu.config.core import ConfigNode, find_model_config, load_config


def test_load_flagship_config():
    cfg = load_config(
        model_config="lora_vit_lora_barcode_bert_lora_bert_ssl",
        project_root_path="/tmp/proj",
    )
    assert cfg.model_config.batch_size == 400
    assert cfg.model_config.epochs == 15
    assert cfg.model_config.output_dim == 768
    assert cfg.model_config.image.model == "lora_vit"
    assert cfg.model_config.dna.model == "lora_barcode_bert"
    assert cfg.model_config.language.model == "lora_bert"
    assert cfg.model_config.dataset == "bioscan_1m"


def test_interpolation_and_late_mutation():
    cfg = load_config(
        model_config="lora_vit_lora_barcode_bert_lora_bert_ssl",
        project_root_path="/tmp/proj",
    )
    assert cfg.bioscan_data.path_to_hdf5_data == (
        "/tmp/proj/data/BIOSCAN_1M/split_data/BioScan_data_in_splits.hdf5"
    )
    # Scripts reassign project_root_path at runtime (train_cl.py:248);
    # downstream interpolations must follow.
    cfg.project_root_path = "/other"
    assert cfg.bioscan_data.dir == "/other/data/BIOSCAN_1M"
    assert cfg.model_config.ckpt_path.startswith("/other/ckpt/bioscan_clip/")


def test_hasattr_probing():
    cfg = load_config(
        model_config="lora_vit_lora_barcode_bert_lora_bert_ssl",
        project_root_path="/tmp",
    )
    # optional-key probing pattern used throughout the reference scripts
    assert hasattr(cfg.model_config, "language")
    assert not hasattr(cfg.model_config, "disable_lora")
    assert not hasattr(cfg.model_config, "lr_scheduler")
    cfg2 = load_config(
        model_config="full_fine_tuning/cosin/BIOSCAN_1M_image_dna_cosin_lr_sche",
        project_root_path="/tmp",
    )
    assert cfg2.model_config.disable_lora is True
    assert cfg2.model_config.lr_scheduler == "cosine"
    assert cfg2.model_config.lr_config.lr == pytest.approx(5e-5)
    assert not hasattr(cfg2.model_config, "language")


def test_nested_name_lookup():
    # nested group configs resolve by bare name too
    p = find_model_config("BIOSCAN_1M_image_dna_one_cycle_lr_sche")
    assert p.exists()


def test_cli_overrides():
    cfg = load_config(
        overrides=[
            "model_config=lora_vit_lora_barcode_bert_5m",
            "model_config.batch_size=24",
            "debug_flag=false",
        ],
        project_root_path="/tmp",
    )
    assert cfg.model_config.batch_size == 24
    assert cfg.debug_flag is False
    assert cfg.model_config.dataset == "bioscan_5m"


def test_runtime_mutation():
    cfg = load_config(
        model_config="lora_vit_lora_barcode_bert_lora_bert_ssl",
        project_root_path="/tmp",
    )
    cfg.model_config.batch_size = 24  # inference_and_eval.py:846 pattern
    assert cfg.model_config.batch_size == 24


def test_all_19_configs_load():
    import pathlib

    base = (
        pathlib.Path(__file__).parent.parent
        / "bioscan_clip_tpu/config/model_config"
    )
    names = [
        str(p.relative_to(base))[: -len(".yaml")] for p in base.rglob("*.yaml")
    ]
    assert len(names) == 19
    for n in names:
        cfg = load_config(model_config=n, project_root_path="/tmp")
        assert cfg.model_config.output_dim == 768


def test_save_config(tmp_path):
    from bioscan_clip_tpu.config.core import save_config

    cfg = load_config(
        model_config="lora_vit_lora_barcode_bert_lora_bert_ssl",
        project_root_path="/tmp",
    )
    save_config(cfg, str(tmp_path / "snap.yaml"))
    import yaml

    snap = yaml.safe_load(open(tmp_path / "snap.yaml"))
    assert snap["model_config"]["batch_size"] == 400
