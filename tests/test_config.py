import os
import textwrap

import pytest

from ucod_dpl_tpu.config import CfgNode, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_attr_access_and_nesting():
    cfg = CfgNode({"a": 1, "b": {"c": [1, 2], "d": {"e": "x"}}})
    assert cfg.a == 1
    assert cfg.b.c == [1, 2]
    assert cfg.b.d.e == "x"
    cfg.b.d.e = "y"
    assert cfg["b"]["d"]["e"] == "y"


def test_freeze_defrost():
    cfg = CfgNode({"a": {"b": 1}})
    cfg.freeze()
    with pytest.raises((AttributeError, KeyError)):
        cfg.a.b = 2
    cfg.defrost()
    cfg.a.b = 2
    assert cfg.a.b == 2


def test_merge_deep():
    base = CfgNode({"train": {"lr": 1e-3, "epochs": 10}, "name": "base"})
    base.merge({"train": {"lr": 2e-4}, "extra": True})
    assert base.train.lr == 2e-4
    assert base.train.epochs == 10
    assert base.extra is True
    assert base.name == "base"


def test_merge_from_list_coercion():
    cfg = CfgNode({"train": {"lr": 0.001, "epochs": 10, "amp": True}})
    cfg.merge_from_list(["train.lr", "2e-4", "train.epochs", "25", "train.amp", "false"])
    assert cfg.train.lr == 2e-4 and isinstance(cfg.train.lr, float)
    assert cfg.train.epochs == 25 and isinstance(cfg.train.epochs, int)
    assert cfg.train.amp is False


def test_base_inheritance_chain(tmp_path):
    (tmp_path / "base.py").write_text(
        textwrap.dedent(
            """
            cfg = dict(a=1, nested=dict(x=1, y=2), name='base')
            """
        )
    )
    (tmp_path / "mid.py").write_text(
        textwrap.dedent(
            """
            cfg = dict(_BASE_=['./base.py'], nested=dict(y=3), name='mid')
            """
        )
    )
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "child.yaml").write_text("_BASE_: ['../mid.py']\nnested:\n  z: 4\n")
    cfg = load_config(str(sub / "child.yaml"))
    assert cfg.a == 1
    assert cfg.nested.x == 1
    assert cfg.nested.y == 3
    assert cfg.nested.z == 4
    assert cfg.name == "mid"


def test_repo_configs_load():
    cfg = load_config(os.path.join(REPO, "configs/uscod/UCOD-DPL_dinov2.py"))
    assert cfg.model_cfg.feature_size == 68
    assert cfg.train_cfg.max_epoch == 25
    assert cfg.dataset_cfg.trainloader_cfg.batch_size == 16
    coral = load_config(os.path.join(REPO, "configs/uscod/CORAL_dinov2.py"))
    assert coral.model_cfg.window_size == 3
    assert coral.model_cfg.window_length == 56
    assert coral.train_cfg.max_epoch == 8
    # inherited from UCOD-DPL base
    assert coral.model_cfg.feature_size == 68


def test_yaml_dump_roundtrip(tmp_path):
    cfg = CfgNode({"a": 1, "b": {"c": [1, 2]}})
    out = tmp_path / "cfg.yaml"
    cfg.dump_yaml(str(out))
    reloaded = load_config(str(out))
    assert reloaded.to_dict() == cfg.to_dict()


def test_merge_from_list_rejects_unknown_keys():
    """A typo'd override must raise (reference merge_from_list asserts
    'Non-existent key', config.py:289-298), not silently create a dead key."""
    import pytest

    cfg = CfgNode({"dataset_cfg": {"trainloader_cfg": {"batch_size": 16}}})
    with pytest.raises(KeyError, match="Non-existent config key"):
        cfg.merge_from_list(["dataset_cfg.train_loader_cfg.batch_size", "2"])
    with pytest.raises(KeyError, match="Non-existent config key"):
        cfg.merge_from_list(["dataset_cfg.trainloader_cfg.batchsize", "2"])
    # allow_new restores create-on-miss for programmatic construction
    cfg.merge_from_list(["dataset_cfg.new_key", "7"], allow_new=True)
    assert cfg.dataset_cfg.new_key == 7


def test_dump_yaml_with_list_of_dicts(tmp_path):
    """_wrap turns dicts inside lists into CfgNodes; to_dict must unwrap
    them again or yaml's safe representer rejects the dump."""
    cfg = CfgNode({"pipeline": [{"type": "flip"}, {"type": "crop", "size": 4}]})
    assert str(cfg)  # __str__ goes through the same representer
    out = tmp_path / "cfg.yaml"
    cfg.dump_yaml(str(out))
    assert load_config(str(out)).to_dict() == cfg.to_dict()


def test_freeze_blocks_dict_mutators_and_nested_lists():
    """update/pop/setdefault/del/clear must honour freeze() like item
    assignment, and freeze must reach CfgNodes inside lists."""
    import pytest

    cfg = CfgNode({"a": 1, "pipeline": [{"type": "flip"}]})
    cfg.freeze()
    with pytest.raises(KeyError):
        cfg.update({"a": 2})
    with pytest.raises(KeyError):
        cfg.pop("a")
    with pytest.raises(KeyError):
        cfg.setdefault("new", 3)
    with pytest.raises(KeyError):
        del cfg["a"]
    with pytest.raises(KeyError):
        cfg.clear()
    with pytest.raises((KeyError, AttributeError)):
        cfg.pipeline[0].type = "rotate"
    cfg.defrost()
    cfg.update({"a": 2})
    cfg.pipeline[0].type = "rotate"
    assert cfg.a == 2 and cfg.pipeline[0].type == "rotate"
    # setdefault on an EXISTING key never mutates -> allowed while frozen
    cfg.freeze()
    assert cfg.setdefault("a", 99) == 2


def test_coerce_rejects_bool_for_int():
    """bool is an int subclass: 'max_epoch True' must raise, not silently
    train range(True) == 1 epoch."""
    import pytest

    cfg = CfgNode({"max_epoch": 5})
    with pytest.raises(ValueError, match="boolean override"):
        cfg.merge_from_list(["max_epoch", "True"])
    assert cfg.max_epoch == 5
