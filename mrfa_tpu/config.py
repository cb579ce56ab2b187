"""YAML config loading — schema-compatible with the reference configs.

The reference configs (/root/reference/config/vox1.yaml, celebvhq.yaml) port
1:1: the same section names and keys drive this framework (`dataset_params`,
`dense_motion`, `fomm_kp_detector`, `tpsm_*`, `raft_flow`, `train_params`,
`reconstruction_params`, `animate_params`, `visualizer_params`,
`mtia_kp_detector`). See config/ in this repo for the ported copies.
"""
from __future__ import annotations

import copy
from typing import Any, Dict

import yaml


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    return cfg


def model_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """The subset of the config consumed by the MRFA flax module."""
    keys = [
        "train_params",
        "dense_motion",
        "fomm_kp_detector",
        "tpsm_kp_detector",
        "tpsm_dense_motion",
        "raft_flow",
        "mtia_kp_detector",
    ]
    out = {k: copy.deepcopy(cfg[k]) for k in keys if k in cfg}
    return out


def hashable_config(cfg: Any):
    """Recursively freeze a config dict for use as a flax module field."""
    if isinstance(cfg, dict):
        return FrozenCfg({k: hashable_config(v) for k, v in cfg.items()})
    if isinstance(cfg, list):
        return tuple(hashable_config(v) for v in cfg)
    return cfg


class FrozenCfg(dict):
    """Hashable immutable-ish dict (flax module fields must be hashable)."""

    def __hash__(self):
        return hash(tuple(sorted((k, _hash_val(v)) for k, v in self.items())))

    def __setitem__(self, *a):
        raise TypeError("FrozenCfg is immutable")


def _hash_val(v):
    if isinstance(v, dict):
        return hash(FrozenCfg(v))
    if isinstance(v, list):
        return hash(tuple(v))
    return hash(v)
