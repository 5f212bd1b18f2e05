"""Checkpoint/resume — upgrade over the reference's minimal persistence.

The reference only does a final `torch.save` behind `--save_model`
(`maxk_gnn_integrated.py:325-332`) plus an unused `save_checkpoint` helper
(`utils/general_utils.py:101-106`) and declares-but-ignores an
`--evaluate PATH` flag. Here: orbax-backed save/restore of
(params + opt_state + epoch + best metrics), best-copy semantics, and a
working eval-only path.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


def save_checkpoint(
    directory: str,
    payload: Dict[str, Any],
    step: int,
    is_best: bool = False,
) -> str:
    """Save under `directory/ckpt_<step>`; mirror to `best/` when best
    (the reference's `best.pth.tar` copy semantics)."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{step}")
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    if is_best:
        best = os.path.join(directory, "best")
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)
    return path


def save_best(directory: str, payload: Dict[str, Any]) -> str:
    """Overwrite `directory/best` with the current payload — called on
    every val improvement, not just periodic-checkpoint boundaries (the
    reference's best.pth.tar copy done right)."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, "best")
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for d in os.listdir(directory):
        if d.startswith("ckpt_"):
            try:
                steps.append(int(d.split("_", 1)[1]))
            except ValueError:
                pass
    if not steps:
        return None
    return os.path.join(directory, f"ckpt_{max(steps)}")


def restore_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a payload with the same pytree structure as `template`.

    Accepts the legacy layout whose top-level key was 'params' (holding
    only the param collection) instead of 'variables' — checkpoints
    written before the rename restore instead of failing with an opaque
    orbax structure mismatch.
    """
    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(path)
    try:
        return ckptr.restore(path, template)
    except (ValueError, KeyError):
        if "variables" not in template:
            raise
        legacy = dict(template)
        legacy["params"] = legacy.pop("variables")["params"]
        restored = ckptr.restore(path, legacy)
        out = dict(restored)
        out["variables"] = {"params": out.pop("params")}
        return out
