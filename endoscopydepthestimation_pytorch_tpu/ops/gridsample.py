"""Bilinear image resampling with torch ``grid_sample`` semantics.

The reference warps depth maps with
``F.grid_sample(mode='bilinear', padding_mode='zeros')`` on a grid
normalized as ``2*(x/W) - 1`` (reference models.py:325-336). Under torch's
``align_corners=False`` convention the unnormalization is
``((g + 1) * W - 1) / 2``, so that pipeline samples at pixel coordinate
``x - 0.5``. We implement the gather directly in pixel space — one fused
elementwise block plus 4 gathers — and expose the same two conventions.

This is the only gather in the training step; everything else XLA fuses
into the surrounding elementwise work.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("align_corners",))
def grid_sample_nhwc(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                     align_corners: bool = False) -> jnp.ndarray:
    """Sample ``image`` (B, H, W, C) at pixel coordinates (x, y) each of
    shape (B, H', W'), normalized by the reference's ``2*(coord/size) - 1``
    grid convention, with zeros padding.

    Equivalent to the reference's ``_bilinear_interpolate`` /
    ``images_warping`` (models.py:317-336) including the implicit half-pixel
    shift of align_corners=False.
    """
    b, h, w, c = image.shape
    if align_corners:
        px = x * (w - 1) / w
        py = y * (h - 1) / h
    else:
        px = x - 0.5
        py = y - 0.5

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0)[..., None]
    wy = (py - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        flat = image.reshape(b, h * w, c)
        idx = yc * w + xc  # (B, H', W')
        vals = jnp.take_along_axis(flat, idx.reshape(b, -1, 1), axis=1)
        vals = vals.reshape(idx.shape + (c,))
        return vals * valid[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy
