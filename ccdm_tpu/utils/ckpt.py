"""Milestone checkpointing (orbax) with the reference's resume semantics.

Mirrors `CCDM_unified/trainer.py:488-535`: one milestone checkpoint holds
{step, model params+stats, optimizer state, EMA shadow}; `load(milestone)`
restores everything; `load(..., return_unet=True)`'s teacher-extraction use
case is served by `ema/online_variables` on the restored state.
Checkpoints live at <results_folder>/model-<milestone> (a directory per
milestone, matching the reference's model-{milestone}.pt naming).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def _path(results_folder: str, milestone: int | str) -> str:
    return os.path.abspath(os.path.join(results_folder, f"model-{milestone}"))


def save_checkpoint(results_folder: str, milestone: int | str, tree: Any) -> str:
    path = _path(results_folder, milestone)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)
    return path


def load_checkpoint(results_folder: str, milestone: int | str, target: Any = None) -> Any:
    path = _path(results_folder, milestone)
    ckptr = ocp.PyTreeCheckpointer()
    try:
        if target is not None:
            return ckptr.restore(path, args=ocp.args.PyTreeRestore(item=target))
        return ckptr.restore(path)
    except ValueError as e:
        # orbax's structure-diff formatter itself can crash (array truth
        # value) while REPORTING a tree mismatch — surface the real cause:
        # the checkpoint predates a change in the model's parameter tree
        raise ValueError(
            f"checkpoint at {path} does not match the current model's "
            "parameter tree (it was written by an older/incompatible model "
            "version); retrain or point --resume_niter at a compatible run"
        ) from e


def checkpoint_exists(results_folder: str, milestone: int | str) -> bool:
    return os.path.isdir(_path(results_folder, milestone))
