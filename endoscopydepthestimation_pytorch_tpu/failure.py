"""Failure detection & outlier-robust model selection (L6 aux subsystem).

The reference ships a dormant per-batch failure detector
(``outlier_detection_processing``, utils.py:1451-1459) driven by the
per-sample SFL, an interactive visualizer (utils.py:1415-1448), and an
outlier-robust comparison of per-batch validation-loss vectors used for
best-model selection (utils.py:1734-1744, 1546-1612). All three are
reproduced here as pure host-side utilities over numpy/jnp arrays.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Sequence, Tuple

import numpy as np

from . import losses


def detect_outlier_batches(flows, flows_from_depth, flow_masks,
                           failure_threshold: float) -> Tuple[List[int], np.ndarray]:
    """Indexes of batch samples whose per-sample SFL exceeds the threshold.

    Parity: reference utils.py:1451-1459 (SparseMaskedL1LossDisplay +
    threshold scan).
    """
    per_sample = np.asarray(losses.sparse_masked_l1_loss_per_sample(
        flows, flows_from_depth, flow_masks))
    indexes = [int(j) for j in np.where(per_sample > failure_threshold)[0]]
    return indexes, per_sample


def worst_sample_report(per_sample_losses_1, per_sample_losses_2,
                        folders: Sequence[str]) -> Dict:
    """Identify the worst sample of each frame of a failing batch — the
    non-interactive core of the reference's ``outlier_detection``
    visualizer (utils.py:1415-1448)."""
    l1 = np.asarray(per_sample_losses_1)
    l2 = np.asarray(per_sample_losses_2)
    i1, i2 = int(np.argmax(l1)), int(np.argmax(l2))
    return {
        "worst_index_1": i1, "worst_loss_1": float(l1[i1]),
        "worst_index_2": i2, "worst_loss_2": float(l2[i2]),
        "worst_folder_1": folders[i1] if folders else None,
        "worst_folder_2": folders[i2] if folders else None,
    }


def outlier_robust_validation_loss_delta(validation_losses,
                                         previous_validation_losses) -> float:
    """Signed comparison of two per-batch validation-loss vectors; negative
    means the new model is better. Each side's contribution is weighted by
    how many batches moved in that direction, which suppresses single-batch
    outliers. Parity: reference utils.py:1734-1744 (including the
    length-mismatch conventions)."""
    validation_losses = np.asarray(validation_losses, dtype=np.float64)
    previous_validation_losses = np.asarray(previous_validation_losses, dtype=np.float64)
    if len(validation_losses) == len(previous_validation_losses):
        diff = validation_losses - previous_validation_losses
        positive = np.sum(np.sum(np.int32(diff > 0.0)) * (diff > 0.0) * diff)
        negative = np.sum(np.sum(np.int32(diff < 0.0)) * (diff < 0.0) * diff)
        return float(positive + negative)
    if len(validation_losses) > len(previous_validation_losses):
        return -1.0
    return 1.0


def save_if_best(save_fn, model_root, best_path, epoch_tag: str,
                 validation_losses, best_validation_losses,
                 save_best_only: bool = True):
    """Best-model selection policy around any checkpoint writer.

    Always writes the per-epoch checkpoint; writes/overwrites ``best_path``
    when the robust comparison improves (or unconditionally when
    ``save_best_only`` is False). Returns the new best-loss vector.
    Parity: reference utils.py:1546-1612 (save_student_model /
    save_teacher_model collapsed into one policy; ``save_fn(path)`` does
    the actual writing).
    """
    model_root = Path(model_root)
    save_fn(model_root / f"checkpoint_model_epoch_{epoch_tag}")
    validation_losses = np.asarray(validation_losses)
    best_validation_losses = np.asarray(best_validation_losses)
    if not save_best_only:
        save_fn(best_path)
        return validation_losses
    if outlier_robust_validation_loss_delta(validation_losses,
                                            best_validation_losses) < 0.0:
        print("Found better model in terms of validation loss: "
              f"{np.mean(validation_losses):.5f}")
        save_fn(best_path)
        return validation_losses
    return best_validation_losses
