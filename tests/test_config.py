"""Tests for the config system (capabilities per SURVEY.md §5.6)."""

import os
import textwrap

import pytest

from rscotr_tpu.config import (Config, Registry, deep_merge,
                               parse_cfg_option_value, replace_cfg_vals)


def write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(textwrap.dedent(text))
    return str(p)


def test_basic_load(tmp_path):
    p = write(tmp_path, "a.py", """
        lr = 0.1
        model = dict(type='MTL', backbone=dict(type='SwinT', depth=12))
    """)
    cfg = Config.fromfile(p)
    assert cfg.lr == 0.1
    assert cfg.model.type == "MTL"
    assert cfg.model.backbone.depth == 12


def test_base_inheritance_and_delete(tmp_path):
    write(tmp_path, "base.py", """
        model = dict(type='MTL', backbone=dict(type='SwinT', depth=12),
                     neck=dict(type='ChannelMapper', out_channels=256))
        data = dict(samples_per_gpu=2)
    """)
    p = write(tmp_path, "child.py", """
        _base_ = ['./base.py']
        model = dict(backbone=dict(depth=24),
                     neck=dict(_delete_=True, type='FPN'))
    """)
    cfg = Config.fromfile(p)
    assert cfg.model.type == "MTL"          # inherited
    assert cfg.model.backbone.depth == 24   # overridden
    assert cfg.model.backbone.type == "SwinT"
    assert cfg.model.neck == {"type": "FPN"}  # _delete_ replaced subtree
    assert cfg.data.samples_per_gpu == 2


def test_base_var_reference(tmp_path):
    write(tmp_path, "base.py", """
        dataset_type = 'ResiscDataset'
        img_size = 224
    """)
    p = write(tmp_path, "child.py", """
        _base_ = './base.py'
        train = dict(type={{_base_.dataset_type}}, size={{_base_.img_size}})
    """)
    cfg = Config.fromfile(p)
    assert cfg.train.type == "ResiscDataset"
    assert cfg.train.size == 224


def test_var_interpolation():
    tree = {"a": {"b": 5}, "s": "${a.b}", "t": "size_${a.b}_x"}
    out = replace_cfg_vals(tree)
    assert out["s"] == 5
    assert out["t"] == "size_5_x"


def test_merge_from_dict(tmp_path):
    p = write(tmp_path, "a.py", """
        model = dict(backbone=dict(depth=12), lr=0.1)
        steps = [1, 2, 3]
    """)
    cfg = Config.fromfile(p)
    cfg.merge_from_dict({"model.backbone.depth": 50, "model.lr": 0.2})
    assert cfg.model.backbone.depth == 50
    assert cfg.model.lr == 0.2


def test_cli_value_parsing():
    assert parse_cfg_option_value("3") == 3
    assert parse_cfg_option_value("0.5") == 0.5
    assert parse_cfg_option_value("true") is True
    assert parse_cfg_option_value("None") is None
    assert tuple(parse_cfg_option_value("1,2,3")) == (1, 2, 3)
    assert parse_cfg_option_value("abc") == "abc"
    assert parse_cfg_option_value("(1,2)") == (1, 2)


def test_dump_roundtrip(tmp_path):
    p = write(tmp_path, "a.py", "x = dict(y=[1, 2], z='s')\n")
    cfg = Config.fromfile(p)
    out = str(tmp_path / "dumped.py")
    cfg.dump(out)
    cfg2 = Config.fromfile(out)
    assert cfg2.x.y == [1, 2]
    assert cfg2.x.z == "s"


def test_registry_build():
    R = Registry("test")

    @R.register_module()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = R.build({"type": "Foo", "a": 1})
    assert (obj.a, obj.b) == (1, 2)
    obj = R.build({"type": "Foo", "a": 1, "b": 9})
    assert obj.b == 9
    with pytest.raises(KeyError):
        R.build({"type": "Bar"})
    # duplicate registration rejected
    with pytest.raises(KeyError):
        R.register_module(name="Foo", module=Foo)


def test_registry_hierarchy():
    parent = Registry("p")
    child = Registry("c", parent=parent)

    @child.register_module()
    class A:
        pass

    assert parent.get("A") is A


def test_deep_merge_lists_by_index():
    base = {"pipeline": [{"type": "Load"}, {"type": "Resize", "size": 224}]}
    out = deep_merge(base, {"pipeline": {"1": {"size": 512}}},
                     allow_list_keys=True)
    assert out["pipeline"][1]["size"] == 512


def test_all_shipped_configs_compose_and_build():
    """Every config under configs/ must compose (incl. _base_ chains and
    the two-level data composition) and build its model module."""
    import glob

    from rscotr_tpu.data import load_data_cfg
    from rscotr_tpu.models import build_model

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(
        glob.glob(os.path.join(root, "configs", "*", "*.py")) +
        glob.glob(os.path.join(root, "configs", "*", "*", "*.py")))
    built = 0
    for p in paths:
        if os.sep + "_base_" + os.sep in p:
            continue  # fragments, not entry configs
        cfg = Config.fromfile(p)
        if "model" not in cfg:
            continue
        cfg = load_data_cfg(cfg, config_root=root)
        model = build_model(cfg.model)
        assert model is not None, p
        built += 1
    assert built >= 15  # flagship + variants + single-task + strategies


class TestCustomImports:
    """mmcv custom_imports capability (reference configs carry
    custom_imports=dict(imports='models.multi', allow_failed_imports=False)
    — /root/reference/configs/multi/MTL_slvlcls_…&dior&potsdam.py:239-241)."""

    def test_user_module_imported_for_side_effects(self, tmp_path,
                                                   monkeypatch):
        import sys
        mod = tmp_path / "my_plugin_mod.py"
        mod.write_text("import os\nos.environ['_PLUGIN_LOADED'] = '1'\n")
        monkeypatch.syspath_prepend(str(tmp_path))
        monkeypatch.delenv("_PLUGIN_LOADED", raising=False)
        p = write(tmp_path, "cfg.py", """
custom_imports = dict(imports=['my_plugin_mod'],
                      allow_failed_imports=False)
x = 1
""")
        cfg = Config.fromfile(str(p))
        assert os.environ.get("_PLUGIN_LOADED") == "1"
        assert cfg.custom_imports["imports"] == ["my_plugin_mod"]  # kept
        sys.modules.pop("my_plugin_mod", None)

    def test_reference_models_names_alias(self, tmp_path):
        # unmodified reference configs import 'models.*' (their own model
        # package); those names must resolve to rscotr_tpu.models here
        p = write(tmp_path, "cfg.py", """
custom_imports = dict(
    imports=['models.det.dino', 'models.det.dino_head'],
    allow_failed_imports=False)
x = 1
""")
        cfg = Config.fromfile(str(p))  # must not raise
        assert cfg.x == 1

    def test_failed_import_raises_or_warns(self, tmp_path):
        import pytest
        p = write(tmp_path, "cfg.py", """
custom_imports = dict(imports='no_such_module_xyz',
                      allow_failed_imports=False)
""")
        with pytest.raises(ImportError):
            Config.fromfile(str(p))
        p2 = write(tmp_path, "cfg2.py", """
custom_imports = dict(imports='no_such_module_xyz',
                      allow_failed_imports=True)
""")
        with pytest.warns(UserWarning):
            Config.fromfile(str(p2))

    def test_import_skippable(self, tmp_path):
        p = write(tmp_path, "cfg.py", """
custom_imports = dict(imports='no_such_module_xyz',
                      allow_failed_imports=False)
""")
        Config.fromfile(str(p), import_custom_modules=False)
