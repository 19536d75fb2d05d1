"""The PyTorch reference's own config files (unmodified, from the read-only
reference tree) must load through our config system — users switching
frameworks keep their experiment configs."""

import os

import pytest

from ucod_dpl_tpu.config import load_config

from conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


@pytest.mark.parametrize(
    "name", ["UCOD-DPL_dinov2", "UCOD-DPL_dinov1", "CORAL_dinov2", "CORAL_dinov1"]
)
def test_reference_configs_load_unchanged(name):
    cfg = load_config(os.path.join(REFERENCE_ROOT, "configs", "uscod", f"{name}.py"))
    # the _BASE_ chain resolved (accelerate + newbase + cod4040)
    assert cfg.model_cfg.dim == 768
    assert cfg.dataset_cfg.trainset_cfg.DATASET == "TR-CAMO+TR-COD10K"
    assert cfg.train_cfg.max_epoch in (8, 25)
    assert "mixed_precision" in cfg  # accelerate base keys pass through
    if name.startswith("CORAL"):
        assert cfg.model_cfg.window_size == 3
        assert cfg.model_cfg.window_length == 56


def test_reference_config_values_match_ours():
    """Our restructured configs resolve to the same hyperparameters as the
    reference's originals (ignoring execution-substrate keys)."""
    ours = load_config("configs/uscod/UCOD-DPL_dinov2.py")
    ref = load_config(os.path.join(REFERENCE_ROOT, "configs/uscod/UCOD-DPL_dinov2.py"))
    for key in ("lr0", "dis_lr0", "max_epoch", "dis_intertrain", "step_lr_gamma"):
        assert ours.train_cfg[key] == ref.train_cfg[key], key
    for key in ("ema_weight", "dim", "feature_size", "dis_use_features"):
        assert ours.model_cfg[key] == ref.model_cfg[key], key
    assert (
        tuple(ours.dataset_cfg.valset_cfg.image_size)
        == tuple(ref.dataset_cfg.valset_cfg.image_size)
    )
    assert ours.val_cfg.look_twice_th == ref.val_cfg.look_twice_th
    assert (
        ours.dataset_cfg.trainset_cfg.bkg_th == ref.dataset_cfg.trainset_cfg.bkg_th
    )
