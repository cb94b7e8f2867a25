"""Checkpointing: full train state (params + batch stats + optimizer +
step) via orbax.

Upgrades the reference's scheme — bare .params files every record_step
with newest-by-ctime discovery and no optimizer state
(car/YOLO.py:546-549, yolo_gluon.py:275-295) — to atomic, versioned
pytree checkpoints with exact resume.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _manager(directory: str, keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True))


def save_checkpoint(directory: str, state: Any, step: int, keep: int = 5):
    mgr = _manager(directory, keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_checkpoint(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    try:
        mgr = _manager(directory)
        step = mgr.latest_step()
        mgr.close()
        return step
    except Exception:
        return None


def restore_tree(directory: str, step: Optional[int] = None) -> Any:
    """Template-free restore: returns the raw stored pytree (nested dicts).
    Useful for tools that only need params/batch_stats out of a full
    TrainState backup without reconstructing its optimizer structure."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint under {directory}")
    restored = mgr.restore(step)
    mgr.close()
    return restored


def restore_checkpoint(directory: str, template: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the structure of ``template`` (a concrete TrainState)."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint under {directory}")
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return restored
