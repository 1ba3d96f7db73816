"""Config system: YAML -> nested namespace, with `--config_mod key=value` overrides.

Keeps the reference public surface (reference: main.py:79-91, 359-367 —
`dict2namespace` + typed `config_mod` eval) while staying torch-free.
"""

from __future__ import annotations

import argparse
import ast
import copy
import os
from typing import Any, List, Optional

import yaml


def dict2namespace(d: dict) -> argparse.Namespace:
    ns = argparse.Namespace()
    for key, value in d.items():
        setattr(ns, key, dict2namespace(value) if isinstance(value, dict) else value)
    return ns


def namespace2dict(ns: Any) -> Any:
    if isinstance(ns, argparse.Namespace):
        return {k: namespace2dict(v) for k, v in vars(ns).items()}
    return ns


def _parse_value(raw: str) -> Any:
    """Typed parse of a config_mod value: literals eval'd, bare words stay strings."""
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        return raw


def apply_config_mods(config: argparse.Namespace, mods: Optional[List[str]]) -> argparse.Namespace:
    """Apply `section.key=value` overrides (reference: main.py:79-91).

    Dotted paths descend into nested namespaces; missing intermediate sections
    are created so new keys can be injected from the CLI.
    """
    if not mods:
        return config
    for mod in mods:
        if "=" not in mod:
            raise ValueError(f"config_mod must look like section.key=value, got: {mod}")
        path, raw = mod.split("=", 1)
        keys = path.strip().split(".")
        node = config
        for key in keys[:-1]:
            if not hasattr(node, key):
                setattr(node, key, argparse.Namespace())
            node = getattr(node, key)
        setattr(node, keys[-1], _parse_value(raw.strip()))
    return config


def load_config(path: str, config_mods: Optional[List[str]] = None) -> argparse.Namespace:
    with open(path, "r") as f:
        config = dict2namespace(yaml.safe_load(f))
    return apply_config_mods(config, config_mods)


def save_config(config: argparse.Namespace, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(namespace2dict(config), f, default_flow_style=False)


def getattr_nested(config: Any, dotted: str, default: Any = None) -> Any:
    node = config
    for key in dotted.split("."):
        if not hasattr(node, key):
            return default
        node = getattr(node, key)
    return node


def clone_config(config: argparse.Namespace) -> argparse.Namespace:
    return copy.deepcopy(config)


def validate_config(config: argparse.Namespace) -> argparse.Namespace:
    """Post-parse validation/overrides (reference: main.py:94-127)."""
    data = config.data
    if getattr(data, "prob_mask_sync", False):
        assert getattr(data, "prob_mask_cond", 0.0) == getattr(data, "prob_mask_future", 0.0), (
            "prob_mask_sync requires prob_mask_cond == prob_mask_future"
        )
    if getattr(config.model, "cond_emb", False):
        assert getattr(data, "prob_mask_cond", 0.0) > 0.0, "cond_emb requires prob_mask_cond > 0"
    # FVD needs at least 10 predicted frames to feed I3D (reference: main.py:107-109).
    sampling = getattr(config, "sampling", None)
    if sampling is not None and getattr(sampling, "fvd", False):
        total = getattr(sampling, "num_frames_pred", 0)
        if total < 10:
            sampling.fvd = False
    return config
