"""Config system tests: defaults, YAML merge, CLI override, type checking."""

import dataclasses

import pytest

from rlobjectdetection_tpu.config import (
    Config,
    DATASET_OVERRIDES,
    LS_OVERRIDES,
    RLConfig,
    cfg_from_file,
    cfg_from_list,
    cfg_update,
)


def test_defaults_match_reference():
    c = Config()
    # spot-check key defaults against utils/config.py
    assert c.TRAIN.LEARNING_RATE == 0.001
    assert c.TRAIN.RPN_PRE_NMS_TOP_N == 12000
    assert c.TRAIN.RPN_POST_NMS_TOP_N == 2000
    assert c.TEST.RPN_PRE_NMS_TOP_N == 6000
    assert c.TEST.RPN_POST_NMS_TOP_N == 300
    assert c.TEST.NMS == 0.3
    assert c.TRAIN.RPN_NMS_THRESH == 0.7
    assert c.TRAIN.BBOX_NORMALIZE_STDS == (0.1, 0.1, 0.2, 0.2)
    assert c.PIXEL_MEANS == (102.9801, 115.9465, 122.7717)
    assert c.RNG_SEED == 3
    assert c.POOLING_SIZE == 7
    assert c.MAX_NUM_GT_BOXES == 20
    assert c.ANCHOR_SCALES == (8, 16, 32)
    assert c.FEAT_STRIDE == (16,)


def test_cfg_update_nested_and_frozen():
    c = Config()
    c2 = cfg_update(c, {"TRAIN": {"SCALES": [800], "MAX_SIZE": 1200}})
    assert c2.TRAIN.SCALES == (800,)
    assert c2.TRAIN.MAX_SIZE == 1200
    assert c.TRAIN.SCALES == (600,)  # original untouched (frozen dataclass)


def test_cfg_update_rejects_unknown_key():
    with pytest.raises(KeyError):
        cfg_update(Config(), {"NOT_A_KEY": 1})
    with pytest.raises(KeyError):
        cfg_update(Config(), {"TRAIN": {"NOPE": 1}})


def test_cfg_update_type_check():
    with pytest.raises(ValueError):
        cfg_update(Config(), {"POOLING_MODE": 3})
    with pytest.raises(ValueError):
        cfg_update(Config(), {"TRAIN": {"SCALES": "abc"}})


def test_cfg_from_list():
    c = cfg_from_list(Config(), ["TRAIN.SCALES", "[800]", "POOLING_MODE", "crop"])
    assert c.TRAIN.SCALES == (800,)
    assert c.POOLING_MODE == "crop"


def test_cfg_from_file(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text("TRAIN:\n  MAX_SIZE: 1200\nPOOLING_MODE: pool\n")
    c = cfg_from_file(Config(), str(p))
    assert c.TRAIN.MAX_SIZE == 1200
    assert c.POOLING_MODE == "pool"


def test_dataset_and_ls_overrides():
    c = cfg_update(Config(), DATASET_OVERRIDES["coco"])
    assert c.ANCHOR_SCALES == (4, 8, 16, 32)
    assert c.MAX_NUM_GT_BOXES == 50
    c = cfg_update(c, LS_OVERRIDES)
    assert c.TRAIN.SCALES == (800,)
    assert c.TEST.MAX_SIZE == 1200


def test_config_hashable_for_jit():
    # configs are static jit args → must be hashable
    assert hash(Config()) == hash(Config())
    assert hash(Config()) != hash(cfg_update(Config(), {"POOLING_MODE": "crop"}))


def test_rl_config_phase():
    tr = RLConfig(phase="train")
    te = RLConfig(phase="test")
    assert tr.ann_file.endswith("train2014.json")
    assert te.ann_file.endswith("minival2014.json")
    assert len(tr.act_delta) == 7
    import numpy as np

    assert abs(RLConfig.act_wtrans(-0.5) - np.exp(0.5)) < 1e-9
