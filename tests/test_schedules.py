"""LR schedule parity vs torch.optim.lr_scheduler (train_cl.py:160-181)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from bioscan_clip_tpu.train import schedules


def _torch_lrs(make_sched, steps):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=1.0)  # lr will be overwritten
    sched = make_sched(opt)
    out = []
    for _ in range(steps):
        out.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.array(out)


def test_one_cycle_matches_torch():
    total = 50
    ref = _torch_lrs(
        lambda opt: torch.optim.lr_scheduler.OneCycleLR(
            opt, max_lr=1e-3, total_steps=total, pct_start=0.3,
            anneal_strategy="cos", cycle_momentum=False,
        ),
        total,
    )
    sched = schedules.one_cycle(1e-3, total)
    ours = np.array([float(sched(i)) for i in range(total)])
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-6)


def test_cosine_matches_torch():
    total = 40
    # torch sets the initial lr from the optimizer: use lr=5e-5 like the
    # full-fine-tuning configs
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=5e-5)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=total, eta_min=1e-5)
    ref = []
    for _ in range(total):
        ref.append(opt.param_groups[0]["lr"])
        opt.step()
        tsched.step()
    sched = schedules.cosine(5e-5, total, 1e-5)
    ours = np.array([float(sched(i)) for i in range(total)])
    np.testing.assert_allclose(ours, np.array(ref), rtol=1e-4)


def test_exponential_and_step():
    e = schedules.exponential(1e-3)
    assert float(e(0)) == pytest.approx(1e-3)
    assert float(e(10)) == pytest.approx(1e-3 * 0.95**10)
    s = schedules.step_decay(1e-3)
    assert float(s(9)) == pytest.approx(1e-3)
    assert float(s(10)) == pytest.approx(5e-4)
    assert float(s(25)) == pytest.approx(1e-3 * 0.5**2)


def test_build_schedule_from_config():
    from bioscan_clip_tpu.config.core import load_config

    cfg = load_config(
        model_config="lora_vit_lora_barcode_bert_lora_bert_ssl",
        project_root_path="/tmp",
    )
    sched = schedules.build_schedule(cfg.model_config, total_steps=100)
    assert float(sched(0)) == pytest.approx(1e-3)  # default constant lr

    cfg2 = load_config(
        model_config="full_fine_tuning/cosin/BIOSCAN_1M_image_dna_cosin_lr_sche",
        project_root_path="/tmp",
    )
    sched2 = schedules.build_schedule(cfg2.model_config, total_steps=100)
    assert float(sched2(0)) == pytest.approx(5e-5)
    assert float(sched2(100)) == pytest.approx(1e-5)
