"""Standalone network validation (the reference's older driver entry).

``network_validation`` (reference utils.py:1615-1731) is the validation
routine of the pre-refactor driver: binarized boundaries, SFL + the
translation-WEIGHTED masked L2 depth-consistency variant, NaN batches
skipped, and — crucially — it returns the PER-BATCH loss vector that
feeds the outlier-robust best-model selection
(failure.outlier_robust_validation_loss_delta / save_if_best,
reference utils.py:1734-1744, 1546-1612). The current drivers use the
mean-only validation in train.py; this module closes the capability gap.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import losses, training
from .ops import geometry


def validation_step(state: training.TrainState, batch: Dict[str, jnp.ndarray],
                    sfl_weight: jnp.ndarray, dcl_weight: jnp.ndarray,
                    epsilon: float = 1.0e-8) -> Dict[str, jnp.ndarray]:
    """One jitted batch of the standalone validation.

    Mirrors reference utils.py:1654-1705: boundaries binarized at 0.9,
    model run per frame with running BN statistics, SFL via the sparse
    masked L1, DCL via the translation-weighted masked L2 (the older
    driver's ``masked_log_l2_loss`` argument was
    NormalizedWeightedMaskedL2Loss).
    """
    boundaries = (batch["boundary"] >= 0.9).astype(jnp.float32)
    colors = jnp.concatenate([batch["color_1"], batch["color_2"]], axis=0)
    bound2 = jnp.concatenate([boundaries, boundaries], axis=0)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    depths = state.apply_fn(variables, colors * bound2, train=False)
    d1, d2 = jnp.split(depths, 2, axis=0)

    k = batch["intrinsic"]
    k2 = jnp.concatenate([k, k], axis=0)
    t_fwd = jnp.concatenate([batch["translation_1_wrt_2"],
                             batch["translation_2_wrt_1"]], axis=0)
    r_fwd = jnp.concatenate([batch["rotation_1_wrt_2"],
                             batch["rotation_2_wrt_1"]], axis=0)

    scaled, _ = geometry.scale_recovery(
        depths,
        jnp.concatenate([batch["sparse_depth_1"], batch["sparse_depth_2"]], 0),
        jnp.concatenate([batch["depth_mask_1"], batch["depth_mask_2"]], 0),
        epsilon)
    s1, s2 = jnp.split(scaled, 2, axis=0)

    flows_from_depth = geometry.flow_from_depth(
        scaled, bound2, t_fwd, r_fwd, k2) * bound2
    sfl = losses.sparse_masked_l1_loss(
        jnp.concatenate([batch["flow_1"], batch["flow_2"]], 0) * bound2,
        flows_from_depth,
        jnp.concatenate([batch["flow_mask_1"], batch["flow_mask_2"]], 0)
        * bound2)

    scaled_swap = jnp.concatenate([s2, s1], axis=0)
    warped, intersect = geometry.warp_depth(
        scaled, scaled_swap, bound2, t_fwd, r_fwd, k2, epsilon)
    dcl = losses.normalized_weighted_masked_l2_loss(
        scaled, warped, intersect, t_fwd, epsilon)

    return {
        "loss": sfl_weight * sfl + dcl_weight * dcl,
        "sparse_flow_loss": sfl_weight * sfl,
        "depth_consistency_loss": dcl_weight * dcl,
    }


def network_validation(state: training.TrainState,
                       batches: Iterable[Dict[str, np.ndarray]],
                       sfl_weight: float = 20.0, dcl_weight: float = 5.0,
                       epsilon: float = 1.0e-8,
                       writer=None, epoch: int = 0
                       ) -> Tuple[float, List[float]]:
    """Run the standalone validation over a loader and return
    ``(mean_loss, per_batch_loss_vector)`` — the vector feeds
    ``failure.save_if_best`` for outlier-robust model selection, exactly
    as the reference's routine returns
    ``np.mean(validation_losses), validation_losses``
    (utils.py:1727-1731). NaN batches are skipped (utils.py:1707).
    """
    step = jax.jit(partial(validation_step, epsilon=epsilon))
    sflw = jnp.asarray(sfl_weight, jnp.float32)
    dclw = jnp.asarray(dcl_weight, jnp.float32)
    totals: List[float] = []
    sfls: List[float] = []
    dcls: List[float] = []
    for batch in batches:
        arrays = {k: jnp.asarray(v) for k, v in batch.items()
                  if not isinstance(v, list)}
        metrics = step(state, arrays, sflw, dclw)
        loss = float(metrics["loss"])
        if not np.isnan(loss):
            totals.append(loss)
            sfls.append(float(metrics["sparse_flow_loss"]))
            dcls.append(float(metrics["depth_consistency_loss"]))
    if writer is not None and totals:
        writer.add_scalars("Validation", {
            "overall": float(np.mean(totals)),
            "depth consistency": float(np.mean(dcls)),
            "sparse opt": float(np.mean(sfls))}, epoch)
    mean = float(np.mean(totals)) if totals else float("nan")
    return mean, totals
