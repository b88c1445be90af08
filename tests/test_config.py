import os

import pytest

from mvuld_tpu.config import default_config, get_config
from mvuld_tpu.core.cfgnode import CfgNode


def test_defaults_freeze():
    cfg = default_config()
    assert cfg.MODEL.NUM_CLASSES == 2
    assert cfg.TRAIN.BASE_LR == 5e-5
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.NUM_CLASSES = 3
    cfg.defrost()
    cfg.MODEL.NUM_CLASSES = 3
    assert cfg.MODEL.NUM_CLASSES == 3


def test_merge_from_list_coercion():
    cfg = default_config()
    cfg.merge_from_list(["TRAIN.BASE_LR", "1e-3", "DATA.BATCH_SIZE", "32",
                         "MODEL.SWINV2.DEPTHS", "[2,2,18,2]", "AMP_ENABLE", "false"])
    assert cfg.TRAIN.BASE_LR == 1e-3
    assert cfg.DATA.BATCH_SIZE == 32
    assert cfg.MODEL.SWINV2.DEPTHS == [2, 2, 18, 2]
    assert cfg.AMP_ENABLE is False
    # selective-remat knob: [] default (= all stages), list override parses
    assert cfg.TRAIN.REMAT_STAGES == []
    cfg.merge_from_list(["TRAIN.REMAT_STAGES", "[2]"])
    assert tuple(cfg.TRAIN.REMAT_STAGES) == (2,)


def test_yaml_base_include(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("MODEL:\n  DROP_PATH_RATE: 0.3\nDATA:\n  IMG_SIZE: 256\n")
    child = tmp_path / "child.yaml"
    child.write_text("BASE: ['base.yaml']\nDATA:\n  IMG_SIZE: 448\n")
    cfg = default_config()
    cfg.merge_from_file(str(child))
    assert cfg.MODEL.DROP_PATH_RATE == 0.3     # from base
    assert cfg.DATA.IMG_SIZE == 448            # child overrides base


def test_reference_style_yaml(tmp_path):
    """The reference's published SwinV2 fine-tune YAML shape must load."""
    y = tmp_path / "swinv2_ft.yaml"
    y.write_text(
        """
MODEL:
  TYPE: swinv2
  NAME: swinv2_base_patch4_window24to28_384to448
  DROP_PATH_RATE: 0.2
  SWINV2:
    EMBED_DIM: 128
    DEPTHS: [ 2, 2, 18, 2 ]
    NUM_HEADS: [ 4, 8, 16, 32 ]
    WINDOW_SIZE: 28
    PRETRAINED_WINDOW_SIZES: [ 12, 12, 12, 6 ]
DATA:
  IMG_SIZE: 448
TRAIN:
  EPOCHS: 300
  WARMUP_EPOCHS: 5
  WEIGHT_DECAY: 1.0e-8
  BASE_LR: 2.0e-05
  WARMUP_LR: 2.0e-08
  MIN_LR: 2.0e-07
"""
    )

    class Args:
        cfg = str(y)
        opts = None

    cfg = get_config(Args())
    assert cfg.MODEL.SWINV2.WINDOW_SIZE == 28
    assert cfg.MODEL.SWINV2.PRETRAINED_WINDOW_SIZES == [12, 12, 12, 6]
    assert cfg.DATA.IMG_SIZE == 448
    assert cfg.is_frozen()
    assert cfg.OUTPUT == os.path.join("output", cfg.MODEL.NAME, "default")


def test_clone_independent():
    cfg = default_config()
    c2 = cfg.clone()
    c2.DATA.BATCH_SIZE = 1
    assert cfg.DATA.BATCH_SIZE == 128
    assert isinstance(c2.DATA, CfgNode)
