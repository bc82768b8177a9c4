"""Checkpoint / resume via Orbax — sharded-pytree layout.

Replaces the reference's `torch.save({"gen", "g_optim", "args"})` dicts
(trainer_rgb.py:143-151). Like the reference, checkpoints are written to
`{checkpoint_path}/{step:06d}` and the resume step is recovered from the
directory name (trainer_rgb.py:130-141)."""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def save(state: TrainState, checkpoint_path: str,
         step: int | None = None) -> str:
    step = int(state.step) if step is None else int(step)
    path = os.path.abspath(os.path.join(checkpoint_path, f"{step:06d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state._asdict(), force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(checkpoint_path: str) -> int | None:
    r"""Largest step directory under checkpoint_path (f"{step:06d}" is a
    MINIMUM width — steps past 999999 write 7+ digits, so match \d{6,}).
    Note the dir is named after the step passed to save(), which the
    CLIs call with the loop index i while the saved state.step is i+1;
    resume recovers the authoritative step from the restored state."""
    if not os.path.isdir(checkpoint_path):
        return None
    steps = [int(d) for d in os.listdir(checkpoint_path)
             if re.fullmatch(r"\d{6,}", d)]
    return max(steps) if steps else None


def restore(path: str, abstract_state) -> Any:
    """`path` is a specific step dir; the step is parsed from its name
    (reference parses the iteration from the checkpoint filename,
    trainer_rgb.py:134). Works for any NamedTuple state (TrainState,
    ArcFaceState, ...) — the restored type mirrors abstract_state."""
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      abstract_state._asdict())
    restored = ckptr.restore(os.path.abspath(path), abstract)
    return type(abstract_state)(**restored)
