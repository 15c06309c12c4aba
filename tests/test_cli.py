"""CLI plumbing tests: config merge semantics and arg-parser surface."""

import os
import pickle
import sys

import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unopticalflow_tpu.utils.config import (
    Config,
    load_yaml_config,
    merge_cli_args,
    snapshot_config,
)


def _write_yaml(tmp_path, d):
    p = tmp_path / "cfg.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(d, f)
    return str(p)


def test_yaml_img_hw_tuple(tmp_path):
    p = _write_yaml(tmp_path, {"img_hw": [256, 832], "dataset": "kitti_depth"})
    cfg = load_yaml_config(p)
    assert cfg["img_hw"] == (256, 832)


def test_cli_overrides_yaml(tmp_path):
    """CLI attrs are copied over YAML keys (reference train.py:203-205)."""

    import argparse

    args = argparse.Namespace(batch_size=4, lr=2e-4)
    p = _write_yaml(tmp_path, {"batch_size": 8, "dataset": "kitti_depth"})
    cfg = merge_cli_args(load_yaml_config(p), args)
    assert cfg.batch_size == 4
    assert cfg.lr == 2e-4
    assert cfg.dataset == "kitti_depth"
    assert cfg.get("nope", 7) == 7
    assert "dataset" in cfg and "nope" not in cfg


def test_snapshot_roundtrip(tmp_path):
    cfg = Config({"a": 1, "img_hw": (64, 128)})
    path = str(tmp_path / "config.pkl")
    snapshot_config(cfg, path)
    with open(path, "rb") as f:
        back = pickle.load(f)
    assert back == {"a": 1, "img_hw": (64, 128)}


def test_train_arg_parser_defaults():
    import train

    args = train.build_arg_parser().parse_args(["-c", "x.yaml"])
    # the reference's flag surface (train.py:166-182)
    assert args.batch_size == 8
    assert args.lr == pytest.approx(1e-4)
    assert args.test_interval == 2000
    assert args.save_interval == 2000
    assert args.mode == "flow"
    assert args.prepared_save_dir == "data_s1"
    assert not args.resume and not args.multi_gpu and not args.no_test


def test_test_arg_parser_defaults():
    import test as test_cli

    args = test_cli.build_arg_parser().parse_args(["-c", "x.yaml"])
    assert args.task == "kitti_flow"
    assert args.mode == "flow"
