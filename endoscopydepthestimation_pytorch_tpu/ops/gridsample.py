"""Bilinear image resampling with torch ``grid_sample`` semantics.

The reference warps depth maps with
``F.grid_sample(mode='bilinear', padding_mode='zeros')`` on a grid
normalized as ``2*(x/W) - 1`` (reference models.py:325-336). Under torch's
``align_corners=False`` convention the unnormalization is
``((g + 1) * W - 1) / 2``, so that pipeline samples at pixel coordinate
``x - 0.5``.

Two implementations with identical semantics:

* ``grid_sample_nhwc`` — 4 explicit gathers. Exact and fine on CPU, but
  TPU lowers per-pixel gathers to a scalar path (~25 ms per 8x256x320
  call, and the backward becomes scatters).
* ``grid_sample_nhwc_mxu`` — gather-free: the bilinear sample is written
  as two one-hot contractions, ``out = rowsum((Y @ img) * X)`` with Y/X
  the sparse row/column interpolation matrices built from iota compares.
  All heavy work lands on the MXU (~53 GMAC for 8x256x320 — sub-ms),
  zeros-padding falls out for free (out-of-range indices match no iota),
  and autodiff produces matmul adjoints instead of scatters. Processed in
  row blocks under ``lax.map`` so the one-hot tiles never materialize in
  HBM at full size.

``grid_sample`` dispatches to the MXU path on TPU.
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


def _unnormalize(x, y, h, w, align_corners):
    if align_corners:
        px = x * (w - 1) / w
        py = y * (h - 1) / h
    else:
        px = x - 0.5
        py = y - 0.5
    # clamp far outside coords to a safe band: anything beyond the image
    # contributes zero either way, and the clamp keeps floor/int32 sane
    px = jnp.clip(px, -2.0, w + 1.0)
    py = jnp.clip(py, -2.0, h + 1.0)
    return px, py


@partial(jax.jit, static_argnames=("align_corners", "block_rows"))
def grid_sample_nhwc_mxu(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                         align_corners: bool = False,
                         block_rows: int = 8) -> jnp.ndarray:
    """Gather-free bilinear sampling via one-hot contractions (TPU path).

    Same semantics as ``grid_sample_nhwc``: pixel-space coords, zeros
    padding, torch align_corners=False convention by default.
    """
    b, h, w, c = image.shape
    bq, hq, wq = x.shape
    px, py = _unnormalize(x, y, h, w, align_corners)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0).astype(image.dtype)
    wy = (py - y0).astype(image.dtype)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    # pad query rows to a multiple of block_rows
    pad = (-hq) % block_rows
    if pad:
        zpad = lambda a: jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
        x0, y0, wx, wy = zpad(x0), zpad(y0), zpad(wx), zpad(wy)
    n_blocks = (hq + pad) // block_rows
    p = block_rows * wq  # queries per block

    def to_blocks(a):
        return a.reshape(bq, n_blocks, p).transpose(1, 0, 2)  # (n, B, P)

    x0b, y0b, wxb, wyb = map(to_blocks, (x0, y0, wx, wy))

    img = image.reshape(b, h, w * c)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, h), 2)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    one = jnp.asarray(1.0, image.dtype)

    def sample_block(args):
        x0c, y0c, wxc, wyc = args  # each (B, P)
        # row-interp matrix Y: (B, P, H), two nonzeros per query row
        yw0 = jnp.where(y0c[..., None] == r_iota, (one - wyc)[..., None], 0)
        yw1 = jnp.where((y0c + 1)[..., None] == r_iota, wyc[..., None], 0)
        rows = jax.lax.dot_general(
            yw0 + yw1, img, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (B, P, W*C)
        rows = rows.reshape(bq, p, w, c)
        # column-interp matrix X: (B, P, W)
        xw0 = jnp.where(x0c[..., None] == c_iota, (one - wxc)[..., None], 0)
        xw1 = jnp.where((x0c + 1)[..., None] == c_iota, wxc[..., None], 0)
        out = jnp.sum(rows * (xw0 + xw1)[..., None].astype(rows.dtype), axis=2)
        return out.astype(image.dtype)                    # (B, P, C)

    blocks = jax.lax.map(sample_block, (x0b, y0b, wxb, wyb))  # (n, B, P, C)
    out = blocks.transpose(1, 0, 2, 3).reshape(bq, hq + pad, wq, c)
    return out[:, :hq]


_BACKEND = "auto"
_BACKENDS = ("auto", "gather", "mxu", "pallas")


def set_backend(name: str) -> None:
    """Select the bilinear-sampler implementation globally.

    'gather' — 4 explicit gathers (exact; fast on CPU, slow on TPU)
    'mxu'    — one-hot contractions in XLA (fast on TPU, SPMD-partitionable)
    'pallas' — the fused Pallas kernel (fastest on TPU; single-chip)
    'auto'   — gather on CPU; pallas on a single TPU chip; mxu otherwise
    """
    global _BACKEND
    if name not in _BACKENDS:
        raise ValueError(f"backend must be one of {_BACKENDS}")
    _BACKEND = name


import contextlib


@contextlib.contextmanager
def backend_scope(name: str):
    """Temporarily select a sampler backend. Dispatch happens at TRACE
    time, so wrapping the body of a traced function (e.g. the per-shard
    function under shard_map, where each shard is effectively single-chip
    and the Pallas kernel applies) in this scope is sufficient."""
    global _BACKEND
    if name not in _BACKENDS:
        raise ValueError(f"backend must be one of {_BACKENDS}")
    old = _BACKEND
    _BACKEND = name
    try:
        yield
    finally:
        _BACKEND = old


def grid_sample(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                align_corners: bool = False,
                grad_first_only: bool = False) -> jnp.ndarray:
    """Backend-dispatching bilinear sampler (see set_backend).

    ``grad_first_only=True`` declares that only image channel 0 needs a
    gradient (the caller's other channels feed non-differentiable
    consumers, e.g. warp_depth's hard mask threshold). The Pallas backend
    then runs its backward single-channel with 2x larger row blocks; the
    XLA backends ignore the hint (their autodiff drops the dead channels
    anyway)."""
    backend = _BACKEND
    if backend == "auto":
        try:
            platform = next(iter(image.devices())).platform
        except Exception:  # tracer inside jit: use the default backend
            platform = jax.default_backend()
        if platform == "cpu":
            backend = "gather"
        elif jax.device_count() == 1:
            # the Pallas call is per-chip; multi-chip meshes keep the
            # SPMD-partitionable XLA formulation
            backend = "pallas"
        else:
            backend = "mxu"
    if backend == "gather":
        return grid_sample_nhwc(image, x, y, align_corners=align_corners)
    if backend == "pallas":
        from .warp_pallas import grid_sample_pallas
        return grid_sample_pallas(image, x, y, align_corners=align_corners,
                                  grad_first_only=grad_first_only)
    return grid_sample_nhwc_mxu(image, x, y, align_corners=align_corners)
