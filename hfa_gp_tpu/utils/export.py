"""Model export & FLOPs accounting.

The reference exports arcface backbones to ONNX (torch2onnx.py) and ships
a FLOPs counter (flops.py). TPU-native equivalents:
  * `export_stablehlo` — serialize any jitted function via jax.export
    (StableHLO): portable to any XLA runtime / IREE / TF.
  * `flops` — XLA's own cost analysis of the compiled computation.
"""

from __future__ import annotations

from typing import Any, Callable

import jax


def export_stablehlo(fn: Callable, args: tuple, path: str | None = None
                     ) -> bytes:
    """Serialize `jit(fn)(*args)` to portable StableHLO bytes."""
    from jax import export as jexport
    exported = jexport.export(jax.jit(fn))(*args)
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_stablehlo(path_or_bytes) -> Callable:
    """Deserialize an exported function; returns a callable."""
    from jax import export as jexport
    blob = path_or_bytes
    if isinstance(path_or_bytes, str):
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jexport.deserialize(blob)
    return exported.call


def flops(fn: Callable, *args) -> dict[str, float]:
    """Compiled-cost analysis: {'flops': ..., 'bytes accessed': ...}."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):          # per-device list on old jax
        analysis = analysis[0]
    return dict(analysis) if analysis else {}
