"""Flat-npz pytree IO — the interchange format written by
tools/convert_pickle.py (torch pickle → JAX) and consumed by the CLIs."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _flatten(tree: dict, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_npz(tree: dict, path: str) -> None:
    np.savez(path, **_flatten(tree))


def load_npz(path: str) -> dict[str, Any]:
    flat = np.load(path)
    tree: dict[str, Any] = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree
