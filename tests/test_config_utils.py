"""Tests for the config system, metrics accumulators, and experiment utils."""

import json
import os

import numpy as np
import pytest

from spef_tpu.config import CfgNode, default_config, discover_experiments, load_config, save_config
from spef_tpu.utils import AverageMeter, RunningAverage, mad, prepare_directories, save_score_error, load_score_error


class TestCfgNode:
    def test_attribute_access(self):
        cfg = default_config()
        assert cfg.MODEL.BACKBONE.NAME == "mobilenet_v2"
        assert cfg.DATA.IMG_SIZE == (240, 384)

    def test_merge_from_yaml(self, tmp_path):
        p = tmp_path / "exp.yaml"
        p.write_text("MODEL:\n  HEAD:\n    ORI: regression\nDATA:\n  BATCH_SIZE: 32\n")
        cfg = load_config(str(p))
        assert cfg.MODEL.HEAD.ORI == "regression"
        assert cfg.DATA.BATCH_SIZE == 32
        assert cfg.MODEL.HEAD.POS == "regression"  # default preserved

    def test_unknown_key_rejected(self, tmp_path):
        p = tmp_path / "bad.yaml"
        p.write_text("NOPE: 1\n")
        with pytest.raises(KeyError):
            load_config(str(p))

    def test_keypoints_pairing_enforced(self, tmp_path):
        p = tmp_path / "kp.yaml"
        p.write_text("MODEL:\n  HEAD:\n    ORI: keypoints\n")
        with pytest.raises(AssertionError):
            load_config(str(p))

    def test_save_roundtrip(self, tmp_path):
        cfg = default_config()
        cfg.DATA.BATCH_SIZE = 99
        save_config(cfg, str(tmp_path / "c.yaml"))
        cfg2 = load_config(str(tmp_path / "c.yaml"))
        assert cfg2.DATA.BATCH_SIZE == 99

    def test_discover_experiments(self, tmp_path):
        (tmp_path / "exp_a.yaml").write_text("DATA:\n  BATCH_SIZE: 1\n")
        d = tmp_path / "exp_b"
        d.mkdir()
        (d / "config.yaml").write_text("DATA:\n  BATCH_SIZE: 2\n")
        (d / "bit_width.json").write_text("{}")
        (tmp_path / "other.yaml").write_text("{}")
        exps = discover_experiments(str(tmp_path))
        assert set(exps) == {"exp_a", "exp_b"}
        assert exps["exp_a"]["bit_width"] is None
        assert exps["exp_b"]["bit_width"].endswith("bit_width.json")


class TestMetrics:
    def test_average_meter(self):
        m = AverageMeter()
        m.update(1.0, n=2)
        m.update(4.0, n=1)
        assert m.avg == pytest.approx(2.0)

    def test_running_average(self):
        r = RunningAverage(keys=("a", "b"))
        r.update({"a": 1.0, "b": 2.0, "ignored": 9.0}, n=1)
        r.update({"a": 3.0}, n=1)
        assert r.get("a") == pytest.approx(2.0)
        assert r.get_multiple(["b"]) == {"b": 2.0}

    def test_mad(self):
        assert mad([1, 1, 2, 2, 4, 6, 9]) == pytest.approx(1.0)


class TestExperimentUtils:
    def test_prepare_directories_versioning(self, tmp_path):
        p = str(tmp_path / "exp")
        first = prepare_directories(p)
        assert first == p
        open(os.path.join(first, "x"), "w").close()
        second = prepare_directories(p, on_collision="version")
        assert second.endswith("_v2")

    def test_save_load_score_error(self, tmp_path):
        scores = {"valid": {"esa": [0.5]}}
        errors = {"valid": {"ori": [10.0], "pos": [0.2]}}
        save_score_error(str(tmp_path), scores, errors)
        loaded = load_score_error(str(tmp_path))
        assert loaded["scores"]["valid"]["esa"] == [0.5]
