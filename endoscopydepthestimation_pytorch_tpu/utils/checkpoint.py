"""Checkpoint / resume (layer L5).

The reference saves ``{model, optimizer, epoch, step, validation}`` per
validated epoch (utils.py:674-682) and on resume restores model/epoch/step
but not the optimizer (train.py:214-227). We save the same logical content
through orbax (async-capable, TPU-friendly) and restore everything —
optimizer state included — which is strictly better; the LR schedule
position is recovered from the step like the reference's
``batch_step(step)``.

Reference *torch* checkpoints are also loadable (weights only) via
``models.torch_import``, and a TPU-trained state exports back to the
reference's ``.pt`` format (``export_torch_checkpoint``) so its own
evaluate.py can consume it — two-way interop.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Tuple

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path, state, epoch: int, validation_loss: float) -> None:
    """Save params/batch_stats/opt_state/step plus epoch & validation loss."""
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": np.int64(epoch),
        "validation": np.float64(validation_loss),
    }
    path = Path(path).absolute()
    _checkpointer().save(path, jax.tree.map(np.asarray, payload), force=True)


def load_checkpoint(path, state) -> Tuple[Any, int, float]:
    """Restore into an existing TrainState template.

    Returns (state, epoch, validation_loss).
    """
    path = Path(path).absolute()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": np.int64(0),
        "validation": np.float64(0.0),
    }
    restored = _checkpointer().restore(path, item=jax.tree.map(np.asarray, template))
    new_state = state.replace(
        params=jax.tree.map(np.asarray, restored["params"]),
        batch_stats=jax.tree.map(np.asarray, restored["batch_stats"]),
        opt_state=jax.tree.map(np.asarray, restored["opt_state"]),
        step=np.asarray(restored["step"]))
    return new_state, int(restored["epoch"]), float(restored["validation"])


def export_torch_checkpoint(path, state, epoch: int = 0,
                            validation_loss: float = 0.0,
                            down_blocks=(4, 4, 4, 4, 4),
                            up_blocks=(4, 4, 4, 4, 4),
                            bottleneck_layers: int = 4) -> None:
    """Write this state's weights as a reference-format torch ``.pt``
    (utils.py:674-682 layout) loadable by the reference train/evaluate."""
    from ..models.torch_import import save_reference_checkpoint
    variables = {"params": jax.tree.map(np.asarray, state.params),
                 "batch_stats": jax.tree.map(np.asarray, state.batch_stats)}
    save_reference_checkpoint(path, variables, epoch=epoch,
                              step=int(state.step),
                              validation=validation_loss,
                              down_blocks=down_blocks, up_blocks=up_blocks,
                              bottleneck_layers=bottleneck_layers)


def load_any_checkpoint(path, state) -> Tuple[Any, int, float]:
    """Load either our orbax checkpoint (a directory) or a reference torch
    ``.pt`` file (weights + step/epoch, optimizer not transferable)."""
    path = Path(path)
    if path.is_dir():
        return load_checkpoint(path, state)
    from ..models.torch_import import load_reference_checkpoint
    variables, meta = load_reference_checkpoint(path)
    new_state = state.replace(
        params=jax.tree.map(np.asarray, variables["params"]),
        batch_stats=jax.tree.map(np.asarray, variables["batch_stats"]),
        step=np.asarray(int(meta.get("step") or 0), np.int32))
    return new_state, int(meta.get("epoch") or 0), float(meta.get("validation") or 0.0)
