"""Orbax checkpoint/resume for fitting runs.

The reference has no checkpointing (SURVEY §5 — closest analog is PNG frame
dumps); the training loop introduced by this framework gets real multi-host
safe checkpoints via orbax.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def make_manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    directory = os.path.abspath(directory)
    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_fit(mgr: ocp.CheckpointManager, step: int, state) -> None:
    mgr.save(step, args=ocp.args.StandardSave(state))


def restore_fit(directory: str, template):
    """Restore the latest checkpoint into the structure of `template`
    (a FitState with correctly-shaped arrays)."""
    mgr = make_manager(directory)
    step = mgr.latest_step()
    if step is None:
        return None
    return mgr.restore(step, args=ocp.args.StandardRestore(template))
