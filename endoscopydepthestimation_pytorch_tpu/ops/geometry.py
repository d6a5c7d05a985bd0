"""Differentiable geometry layers (L3b) as pure jittable functions, NHWC.

The reference implements these as CUDA-resident torch graphs
(models.py:317-554). Here each is a stateless function over NHWC arrays;
under ``jit`` XLA fuses the per-pixel reprojection chains into a couple of
elementwise kernels plus the single bilinear gather (ops/gridsample.py),
which is the TPU-optimal shape for this math. A fused Pallas variant of the
warp lives in ops/warp_pallas.py.

Conventions (identical to the reference):
  * depth maps, masks: (B, H, W, 1) float32
  * rotation: (B, 3, 3); translation: (B, 3, 1); intrinsics: (B, 3, 3)
  * pixel grid is (u=x=column, v=y=row), origin top-left
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .gridsample import grid_sample, grid_sample_nhwc

MASKED_DEPTH_SENTINEL = 1.0e30  # reference models.py:410


def intrinsics_inverse(k: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a (B, 3, 3) pinhole intrinsic matrix.

    K is upper-triangular [[fx,0,cx],[0,fy,cy],[0,0,1]]; the closed form is
    exact and cheaper/stabler than the LU solve the reference uses
    (models.py:392: torch.solve).
    """
    fx = k[:, 0, 0]
    fy = k[:, 1, 1]
    cx = k[:, 0, 2]
    cy = k[:, 1, 2]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    inv = jnp.stack([
        jnp.stack([1.0 / fx, zeros, -cx / fx], axis=-1),
        jnp.stack([zeros, 1.0 / fy, -cy / fy], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1),
    ], axis=-2)
    return inv


def _pixel_grid(height: int, width: int, dtype=jnp.float32):
    x = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    y = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    return x, y


def _reprojection_terms(rotation: jnp.ndarray, translation: jnp.ndarray,
                        intrinsics: jnp.ndarray, height: int, width: int):
    """W = K R^T (-t), M = K R^T K^-1, and the per-pixel M @ [u, v, 1]^T.

    Returns (w_vec (B,3), m_pix (B,H,W,3)). Reference models.py:377-402.
    """
    k_inv = intrinsics_inverse(intrinsics)
    temp = intrinsics @ jnp.swapaxes(rotation, 1, 2)   # K R^T
    w_vec = (temp @ (-translation))[..., 0]            # (B, 3)
    m = temp @ k_inv                                   # (B, 3, 3)

    x, y = _pixel_grid(height, width)
    # m_pix[b, h, w, i] = m[b, i, 0]*x + m[b, i, 1]*y + m[b, i, 2]
    m = m[:, None, None, :, :]                         # (B,1,1,3,3)
    m_pix = (m[..., 0] * x[None, :, :, None] +
             m[..., 1] * y[None, :, :, None] + m[..., 2])
    return w_vec, m_pix


def warp_coordinates(depth_maps: jnp.ndarray, img_masks: jnp.ndarray,
                     translation: jnp.ndarray, rotation: jnp.ndarray,
                     intrinsics: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Source pixel coordinates (u2, v2) in frame 2 for every frame-1 pixel,
    given frame-1 depth. Masked pixels get z2 = 1e30 so u2, v2 -> ~0.

    Parity: reference models.py:377-429 (_warp_coordinate_generate);
    depth_maps NHWC (B, H, W, 1).
    """
    b, h, w, _ = depth_maps.shape
    w_vec, m_pix = _reprojection_terms(rotation, translation, intrinsics, h, w)
    w_b = w_vec[:, None, None, :]  # (B,1,1,3)

    z2 = w_b[..., 2:3] + depth_maps * m_pix[..., 2:3]
    z2 = MASKED_DEPTH_SENTINEL * (1.0 - img_masks) + img_masks * z2
    u2 = (w_b[..., 0:1] + depth_maps * m_pix[..., 0:1]) / z2
    v2 = (w_b[..., 1:2] + depth_maps * m_pix[..., 1:2]) / z2
    return u2, v2


def flow_from_depth(depth_maps: jnp.ndarray, img_masks: jnp.ndarray,
                    translation: jnp.ndarray, rotation: jnp.ndarray,
                    intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Dense optical flow frame1->frame2 implied by depth + relative pose,
    normalized by image size: ((u2-u)/W, (v2-v)/H). (B, H, W, 2).

    Parity: reference models.py:366-374, 433-451 (FlowfromDepthLayer),
    with NHWC instead of NCHW.
    """
    b, h, w, _ = depth_maps.shape
    u2, v2 = warp_coordinates(depth_maps, img_masks, translation, rotation, intrinsics)
    x, y = _pixel_grid(h, w)
    fx = (u2[..., 0] - x[None]) / float(w)
    fy = (v2[..., 0] - y[None]) / float(h)
    return jnp.stack([fx, fy], axis=-1)


def warp_depth(depth_maps_1: jnp.ndarray, depth_maps_2: jnp.ndarray,
               img_masks: jnp.ndarray, translation: jnp.ndarray,
               rotation: jnp.ndarray, intrinsics: jnp.ndarray,
               epsilon: float = 1.0e-8,
               align_corners: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp frame-2's depth into frame-1's geometry.

    1. compute (u2, v2) for every frame-1 pixel from d1 and the 1->2 pose;
    2. express frame-1 depth as seen from frame 2:
       d1_in_2 = (K t)_z + d2 * (K R K^-1 [u,v,1])_z, masked;
    3. bilinearly sample that map at (u2, v2);
    4. intersection mask = (bilinear(mask) * mask >= 0.9).

    Returns (warped_depth (B,H,W,1), intersect_mask (B,H,W,1)).
    Parity: reference models.py:454-554 (_depth_warping), NHWC.
    """
    b, h, w, _ = depth_maps_1.shape
    d1 = depth_maps_1 * img_masks
    d2 = depth_maps_2 * img_masks

    w_vec, m_pix = _reprojection_terms(rotation, translation, intrinsics, h, w)
    w_b = w_vec[:, None, None, :]

    z2 = w_b[..., 2:3] + d1 * m_pix[..., 2:3]
    z2 = jnp.where(img_masks > 0.5, z2, epsilon)
    z2 = jnp.where(z2 > 0.0, z2, epsilon)
    u2 = (w_b[..., 0:1] + d1 * m_pix[..., 0:1]) / z2
    v2 = (w_b[..., 1:2] + d1 * m_pix[..., 1:2]) / z2

    # frame-1 depth as seen from frame 2 (reference models.py:531-541)
    k_inv = intrinsics_inverse(intrinsics)
    w2_z = (intrinsics @ translation)[:, 2, 0][:, None, None, None]
    m2 = intrinsics @ rotation @ k_inv
    x, y = _pixel_grid(h, w)
    m2_z = (m2[:, None, None, 2, 0] * x[None] + m2[:, None, None, 2, 1] * y[None] +
            m2[:, None, None, 2, 2])[..., None]
    d1_in_2 = img_masks * (w2_z + d2 * m2_z)

    u2f = u2[..., 0]
    v2f = v2[..., 0]
    # sample depth and mask in ONE call (2 channels): halves the one-hot
    # matrix construction on the TPU path
    stacked = jnp.concatenate([d1_in_2, img_masks], axis=-1)
    # the mask channel only feeds the hard >= 0.9 threshold below (zero
    # cotangent), so the sampler may restrict its backward to channel 0
    sampled = grid_sample(stacked, u2f, v2f, align_corners=align_corners,
                          grad_first_only=True)
    warped = sampled[..., 0:1]
    sampled_mask = sampled[..., 1:2]
    intersect = (sampled_mask * img_masks >= 0.9).astype(depth_maps_1.dtype)
    return warped, intersect


def scale_recovery_per_sample(predicted_depths: jnp.ndarray,
                              sparse_depths: jnp.ndarray,
                              weighted_sparse_masks: jnp.ndarray,
                              epsilon: float = 1.0e-8
                              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-sample scale recovery returning the raw (B,) diagnostics.

    Keep sparse depths > 0.5 * their masked mean; the scale is the mean
    ratio sparse/predicted over the kept pixels. Returns
    (scaled_depths, scale_stds (B,), scales (B,)) so callers can form the
    reference's cross-batch diagnostic over any sub-batch (e.g. per frame
    of a stacked pair). Reference models.py:339-363 (DepthScalingLayer).
    """
    axes = (1, 2, 3)
    binary = (weighted_sparse_masks > 1.0e-8).astype(predicted_depths.dtype)
    mean_sparse = (jnp.sum(sparse_depths * binary, axes, keepdims=True) /
                   jnp.sum(binary, axes, keepdims=True))
    above = (sparse_depths > 0.5 * mean_sparse).astype(predicted_depths.dtype)

    scale_maps = sparse_depths * above / (epsilon + predicted_depths)
    n_above = jnp.sum(above, axes, keepdims=True)
    mean_scales = jnp.sum(scale_maps, axes, keepdims=True) / n_above
    centered = scale_maps - above * mean_scales
    scale_stds = jnp.sqrt(jnp.sum(centered * centered, axes) / n_above[:, 0, 0, 0])
    scales = mean_scales[:, 0, 0, 0]
    return mean_scales * predicted_depths, scale_stds, scales


def normalized_scale_std(scale_stds: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """The reference's stability diagnostic mean(std_i) * mean(1/scale_j):
    it divides a (B,) std vector by a (B,1,1,1) mean tensor, broadcasting
    to (B,1,1,B) before the mean (models.py:361-363) — a CROSS-batch
    normalization, reproduced exactly (golden-tested; it is a logged
    diagnostic, not part of the loss)."""
    return jnp.mean(scale_stds) * jnp.mean(1.0 / scales)


def scale_recovery(predicted_depths: jnp.ndarray, sparse_depths: jnp.ndarray,
                   weighted_sparse_masks: jnp.ndarray,
                   epsilon: float = 1.0e-8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample global scale from sparse SfM depths, plus the batch-level
    normalized-std diagnostic. Parity: reference models.py:339-363
    (DepthScalingLayer), NHWC."""
    scaled, scale_stds, scales = scale_recovery_per_sample(
        predicted_depths, sparse_depths, weighted_sparse_masks, epsilon)
    return scaled, normalized_scale_std(scale_stds, scales)


def images_warping(images: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                   align_corners: bool = False) -> jnp.ndarray:
    """Warp NHWC images by absolute source pixel coordinates (u, v) each
    (B, H, W). Parity: reference models.py:317-322."""
    return grid_sample_nhwc(images, u, v, align_corners=align_corners)
