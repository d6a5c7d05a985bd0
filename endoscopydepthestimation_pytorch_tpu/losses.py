"""Loss functions and evaluation metrics (layer L3c), NHWC pure functions.

Complete re-expression of the reference suite (losses.py:17-227). The two
training losses are ``sparse_masked_l1_loss`` (SFL, train.py:210,300) and
``normalized_distance_loss`` (DCL, train.py:211,311); the rest are kept for
capability parity (teacher-student distillation, legacy variants, and the
AbsRel / sigma-threshold evaluation metrics).

All functions reduce over (H, W, C) per sample and then mean over the
batch, exactly like the reference's ``dim=(1, 2, 3)`` reductions (which are
NCHW there; the set of reduced axes is identical).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_AXES = (1, 2, 3)


def sparse_masked_l1_loss(flows, flows_from_depth, sparse_masks,
                          epsilon: float = 1.0) -> jnp.ndarray:
    """Sparse Flow Loss: sum(mask*|f - f_hat|)/(eps + sum(mask)), batch
    mean. Reference losses.py:57-66 (default epsilon 1.0)."""
    per_sample = (jnp.sum(sparse_masks * jnp.abs(flows - flows_from_depth), _AXES) /
                  (epsilon + jnp.sum(sparse_masks, _AXES)))
    return jnp.mean(per_sample)


def sparse_masked_l1_loss_per_sample(flows, flows_from_depth, sparse_masks,
                                     epsilon: float = 1.0) -> jnp.ndarray:
    """Per-sample SFL (no batch mean) — used by the outlier detector.
    Reference losses.py:69-79."""
    return (jnp.sum(sparse_masks * jnp.abs(flows - flows_from_depth), _AXES) /
            (epsilon + jnp.sum(sparse_masks, _AXES)))


def normalized_distance_loss(depth_maps, warped_depth_maps, intersect_masks,
                             intrinsics, eps: float = 1.0e-5) -> jnp.ndarray:
    """Depth Consistency Loss: unproject both depth maps to 3-D with K and
    compare, normalized by the masked depth magnitude.

    Reference losses.py:112-146 (grid recomputed here instead of cached at
    construction; XLA folds it). ``mean_value`` uses stop_gradient to match
    the reference's no_grad block.
    """
    b, h, w, _ = depth_maps.shape
    fx = intrinsics[:, 0, 0][:, None, None, None]
    fy = intrinsics[:, 1, 1][:, None, None, None]
    cx = intrinsics[:, 0, 2][:, None, None, None]
    cy = intrinsics[:, 1, 2][:, None, None, None]
    x = jax.lax.broadcasted_iota(depth_maps.dtype, (h, w), 1)[None, :, :, None]
    y = jax.lax.broadcasted_iota(depth_maps.dtype, (h, w), 0)[None, :, :, None]

    mean_value = jax.lax.stop_gradient(
        jnp.sum(intersect_masks * depth_maps, _AXES) /
        (eps + jnp.sum(intersect_masks, _AXES)))

    def unproject(d):
        return jnp.concatenate([(x - cx) / fx * d, (y - cy) / fy * d, d], axis=-1)

    diff = jnp.abs(unproject(depth_maps) - unproject(warped_depth_maps))
    per_sample = (2.0 * jnp.sum(intersect_masks * diff, _AXES) /
                  (1.0e-5 * mean_value +
                   jnp.sum(intersect_masks * (depth_maps + jnp.abs(warped_depth_maps)), _AXES)))
    return jnp.mean(per_sample)


def scale_invariant_loss(predicted_depths, goal_depths, boundaries,
                         epsilon: float = 1.0e-8) -> jnp.ndarray:
    """Eigen log-ratio scale-invariant loss for teacher-student
    distillation. Reference losses.py:17-32."""
    ratio = (jnp.log(boundaries * predicted_depths + epsilon) -
             jnp.log(boundaries * goal_depths + epsilon))
    weight = jnp.sum(boundaries, _AXES)
    loss_1 = jnp.sum(ratio * ratio, _AXES) / weight
    sum_2 = jnp.sum(ratio, _AXES)
    loss_2 = (sum_2 * sum_2) / (weight * weight)
    return jnp.mean(loss_1 + loss_2)


def masked_scale_invariant_loss(predicted_depths, sparse_depths, sparse_masks,
                                epsilon: float = 1.0e-8) -> jnp.ndarray:
    """Sparse-masked Eigen loss. Reference losses.py:167-186."""
    ratio = jnp.where(sparse_depths < 0.5, 0.0,
                      jnp.log(predicted_depths + epsilon) - jnp.log(sparse_depths))
    weight = jnp.sum(sparse_masks, _AXES)
    loss_1 = jnp.sum(sparse_masks * ratio * ratio, _AXES) / weight
    sum_2 = jnp.sum(sparse_masks * ratio, _AXES)
    loss_2 = (sum_2 * sum_2) / (weight * weight)
    return jnp.mean(loss_1 + loss_2)


def masked_l1_loss(images, twice_warped_images, intersect_masks,
                   epsilon: float = 1.0) -> jnp.ndarray:
    """Masked mean absolute error. Reference losses.py:82-91."""
    per_sample = (jnp.sum(intersect_masks * jnp.abs(images - twice_warped_images), _AXES) /
                  (epsilon + jnp.sum(intersect_masks, _AXES)))
    return jnp.mean(per_sample)


def normalized_l2_loss(depth_maps, warped_depth_maps, intersect_masks,
                       eps: float = 1.0e-3) -> jnp.ndarray:
    """Legacy symmetric normalized L2 DCL. Reference losses.py:94-109."""
    mean_value = jax.lax.stop_gradient(
        jnp.sum(intersect_masks * depth_maps, _AXES) /
        (eps + jnp.sum(intersect_masks, _AXES)))
    diff = depth_maps - warped_depth_maps
    per_sample = (jnp.sum(intersect_masks * diff * diff, _AXES) /
                  (0.5 * jnp.sum(intersect_masks *
                                 (depth_maps ** 2 + warped_depth_maps ** 2), _AXES) +
                   1.0e-5 * mean_value * mean_value))
    return jnp.mean(per_sample)


def normalized_l1_loss(depth_maps, warped_depth_maps, masks,
                       eps: float = 1.0e-3) -> jnp.ndarray:
    """Symmetric normalized L1. Reference losses.py:149-164."""
    mean_value = (jnp.sum(masks * depth_maps, _AXES) /
                  (eps + jnp.sum(masks, _AXES)))
    per_sample = (jnp.sum(masks * jnp.abs(depth_maps - warped_depth_maps), _AXES) /
                  (0.5 * jnp.sum(masks * (jnp.abs(depth_maps) +
                                          jnp.abs(warped_depth_maps)), _AXES) +
                   1.0e-5 * mean_value))
    return jnp.mean(per_sample)


def normalized_weighted_masked_l2_loss(depth_maps, warped_depth_maps,
                                       intersect_masks, translations,
                                       epsilon: float = 1.0) -> jnp.ndarray:
    """Translation-magnitude-weighted normalized L2 (legacy DCL variant).
    Reference losses.py:35-54."""
    t = translations.reshape(-1, 3)
    norms = jnp.sqrt(jnp.sum(t * t, axis=1))
    weights = 1.0 / (1.0e-8 + norms)
    diff = depth_maps - warped_depth_maps
    per_sample = (jnp.sum(intersect_masks * diff * diff, _AXES) /
                  (0.5 * jnp.sum(intersect_masks *
                                 (depth_maps ** 2 + warped_depth_maps ** 2), _AXES) +
                   epsilon))
    return jnp.sum(per_sample * weights) / jnp.sum(weights)


# ---------------------------------------------------------------------------
# evaluation metrics
# ---------------------------------------------------------------------------

def abs_rel_error(scaled_depth_maps, sparse_depth_maps, sparse_depth_masks,
                  eps: float = 1.0e-8) -> jnp.ndarray:
    """Per-sample absolute relative error over sparse ground-truth pixels.
    Reference losses.py:189-199."""
    return (jnp.sum(sparse_depth_masks * jnp.abs(scaled_depth_maps - sparse_depth_maps) /
                    (eps + sparse_depth_maps), _AXES) /
            jnp.sum(sparse_depth_masks, _AXES))


def threshold_metric(scaled_depth_maps, sparse_depth_maps, sparse_depth_masks,
                     eps: float = 1.0e-8) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """sigma < 1.25 / 1.25^2 / 1.25^3 accuracy triple over sparse pixels.
    Reference losses.py:202-227."""
    ratio = jnp.maximum(
        scaled_depth_maps * sparse_depth_masks / (eps + sparse_depth_maps),
        sparse_depth_maps / (eps + scaled_depth_maps * sparse_depth_masks))
    threshold_map = sparse_depth_masks * ratio + (1.0 - sparse_depth_masks) * 10.0
    n = jnp.sum(sparse_depth_masks, _AXES)
    sigma_1 = jnp.sum((threshold_map < 1.25).astype(jnp.float32), _AXES) / n
    sigma_2 = jnp.sum((threshold_map < 1.25 ** 2).astype(jnp.float32), _AXES) / n
    sigma_3 = jnp.sum((threshold_map < 1.25 ** 3).astype(jnp.float32), _AXES) / n
    return sigma_1, sigma_2, sigma_3
