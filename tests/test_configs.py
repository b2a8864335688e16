"""Config-zoo sweep: every config loads and its model builds.

Parity: reference tests/test_runtime/test_config.py — cheap full-registry
coverage without data.
"""
import glob
import os.path as osp

import pytest

import pointtinybenchmark_tpu.data  # noqa: F401 — register pipelines/datasets
from pointtinybenchmark_tpu.models import build_detector
from pointtinybenchmark_tpu.utils import Config

CFG_DIR = osp.join(osp.dirname(__file__), "..", "configs")
CONFIGS = [p for p in glob.glob(osp.join(CFG_DIR, "**", "*.py"),
                                recursive=True)
           if "_base_" not in p]


@pytest.mark.parametrize("cfg_path", CONFIGS,
                         ids=[osp.relpath(p, CFG_DIR) for p in CONFIGS])
def test_config_loads_and_model_builds(cfg_path):
    cfg = Config.fromfile(cfg_path)
    assert "model" in cfg
    model = build_detector(dict(cfg.model),
                           cfg.get("train_cfg") or cfg.model.get("train_cfg"),
                           cfg.get("test_cfg") or cfg.model.get("test_cfg"))
    assert model is not None
    # data + schedule sections exist
    assert "data" in cfg and "train" in cfg.data
    assert "optimizer" in cfg
    # pipelines reference registered transforms
    from pointtinybenchmark_tpu.utils.registry import PIPELINES
    for t in cfg.data["train"]["pipeline"]:
        assert t["type"] in PIPELINES, t["type"]
