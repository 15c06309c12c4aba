"""YAML + CLI config system.

Reproduces the reference's config semantics (/root/reference/train.py:185-223):
YAML is loaded flat, ``img_hw`` becomes a tuple, CLI attributes are copied
*over* the YAML dict (CLI wins), and the merged dict is flattened into an
attribute object.  ``Config`` additionally supports dict-style access and a
``to_dict`` for snapshotting (the reference pickles the object; we snapshot
YAML + pickle for compatibility).
"""

from __future__ import annotations

import pickle

import yaml


class Config:
    """Flat attribute bag (the reference's anonymous ``pObject``)."""

    def __init__(self, d: dict | None = None):
        for k, v in (d or {}).items():
            setattr(self, k, v)

    def __getitem__(self, k):
        return getattr(self, k)

    def __contains__(self, k):
        return hasattr(self, k)

    def get(self, k, default=None):
        return getattr(self, k, default)

    def to_dict(self) -> dict:
        return {k: v for k, v in vars(self).items() if not k.startswith("__")}

    def __repr__(self):
        return f"Config({self.to_dict()!r})"


def load_yaml_config(path: str) -> dict:
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    if "img_hw" in cfg:
        cfg["img_hw"] = (int(cfg["img_hw"][0]), int(cfg["img_hw"][1]))
    return cfg


def merge_cli_args(cfg: dict, args) -> Config:
    """Copy argparse attributes over the YAML dict (train.py:203-205)."""
    for attr in vars(args):
        cfg[attr] = getattr(args, attr)
    return Config(cfg)


def snapshot_config(cfg: Config, path: str) -> None:
    """Pickle the merged config next to the checkpoints (train.py:222-223)."""
    with open(path, "wb") as f:
        pickle.dump(cfg.to_dict(), f)
