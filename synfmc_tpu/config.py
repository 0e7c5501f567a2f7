"""Minimal OmegaConf-compatible config loading.

The reference loads flat YAML files with ``OmegaConf.load(config)`` and splats
them into ``main(**config)`` (reference: train_cam_ctrl.py:797-806).  We keep
the same YAML key names (the reference configs drop in unchanged) but avoid
the OmegaConf dependency: plain PyYAML plus a dict subclass with attribute
access and recursive merge.
"""

from __future__ import annotations

import copy
import io
from typing import Any, Mapping

import yaml


class ConfigDict(dict):
    """dict with attribute access, recursive wrapping, and deep merge."""

    def __init__(self, data: Mapping[str, Any] | None = None, **kw):
        super().__init__()
        merged = dict(data or {})
        merged.update(kw)
        for k, v in merged.items():
            self[k] = v

    @staticmethod
    def _wrap(value):
        if isinstance(value, Mapping) and not isinstance(value, ConfigDict):
            return ConfigDict(value)
        if isinstance(value, list):
            return [ConfigDict._wrap(v) for v in value]
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, ConfigDict._wrap(value))

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __deepcopy__(self, memo):
        return ConfigDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def get_path(self, dotted: str, default=None):
        """cfg.get_path('train_data.params.sample_size')"""
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node

    def merged_with(self, other: Mapping[str, Any]) -> "ConfigDict":
        out = copy.deepcopy(self)
        _deep_merge(out, other)
        return out

    def to_dict(self) -> dict:
        def unwrap(v):
            if isinstance(v, ConfigDict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, list):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)


def _deep_merge(dst: ConfigDict, src: Mapping[str, Any]) -> None:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], ConfigDict) and isinstance(v, Mapping):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v


def load_config(path_or_stream) -> ConfigDict:
    """Load a YAML config into a ConfigDict (OmegaConf.load equivalent)."""
    if hasattr(path_or_stream, "read"):
        data = yaml.safe_load(path_or_stream)
    else:
        with open(path_or_stream) as f:
            data = yaml.safe_load(f)
    return ConfigDict(data or {})


def loads_config(text: str) -> ConfigDict:
    return load_config(io.StringIO(text))


def save_config(cfg: Mapping[str, Any], path: str) -> None:
    """Echo the full config to the run dir (reference: train_cam_ctrl.py:218)."""
    cfg = cfg.to_dict() if isinstance(cfg, ConfigDict) else dict(cfg)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def is_placeholder_path(p) -> bool:
    """True for the shipped configs' '[path to ...]' placeholder strings —
    explicitly not-a-path, skipped quietly everywhere (unlike a typo'd real
    path, which must fail loud)."""
    return str(p).strip().startswith("[")
