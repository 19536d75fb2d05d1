"""Entry-script plumbing: work_dir derivation, mode flips, overrides."""

import os
import sys
from types import SimpleNamespace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.common import init_cfg  # noqa: E402


def _args(**kw):
    return SimpleNamespace(
        config=os.path.join(REPO, "configs/uscod/UCOD-DPL_dinov2.py"),
        work_dir=kw.pop("work_dir", "work_dir"),
        resume=None,
        load_from=None,
        refiner_path=None,
        opts=kw.pop("opts", []),
        **kw,
    )


def test_init_cfg_eval_mode(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = _args(work_dir=str(tmp_path / "wd"))
    cfg = init_cfg(args, mode="eval")
    assert cfg.mode == "eval"
    assert cfg.dataset_cfg.valset_cfg.keep_size is True
    assert cfg.work_dir.endswith(os.path.join("uscod", "UCOD-DPL_dinov2"))
    assert os.path.isdir(cfg.work_dir)
    assert cfg.log_cfg.log_path


def test_init_cfg_train_mode_and_overrides(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = _args(
        work_dir=str(tmp_path / "wd"),
        opts=["train_cfg.lr0", "5e-4", "model_cfg.feature_size", "32"],
    )
    args.load_from = "/some/ckpt.safetensors"
    args.resume = "/some/state"
    cfg = init_cfg(args, mode="train")
    assert cfg.mode == "train"
    assert cfg.dataset_cfg.valset_cfg.keep_size is False
    assert cfg.train_cfg.lr0 == 5e-4
    assert cfg.model_cfg.feature_size == 32
    # load_from flows to the Runner constructor directly, NOT into cfg
    # (a dead cfg key would mislead config authors); only resume is
    # cfg-consumed (TrainLoop._resume)
    assert "checkpoint" not in cfg.train_cfg
    assert cfg.train_cfg.resume == "/some/state"


def test_explicit_log_path_override_wins(tmp_path, monkeypatch):
    """--opts log_cfg.log_path <path> is the user speaking and must not be
    overwritten by the work_dir-derived default (while a base-config
    log_path default IS overwritten — reference runner.py:133-140)."""
    import os

    cfg_file = tmp_path / "c.py"
    cfg_file.write_text(
        "cfg = dict(log_cfg=dict(log_path='./work/logs'), train_cfg=dict(lr0=1e-3),\n"
        "           dataset_cfg=dict(valset_cfg=dict(keep_size=False)))\n"
    )
    custom = str(tmp_path / "mylogs")
    args = _args(work_dir=str(tmp_path / "wd"),
                 opts=["log_cfg.log_path", custom])
    args.config = str(cfg_file)
    cfg = init_cfg(args, mode="train")
    assert cfg.log_cfg.log_path == custom

    args2 = _args(work_dir=str(tmp_path / "wd2"))
    args2.config = str(cfg_file)
    cfg2 = init_cfg(args2, mode="train")
    assert cfg2.log_cfg.log_path == os.path.join(cfg2.work_dir, "logs")
