"""Pallas TPU kernel: fused bilinear warp sampler (forward + backward).

The depth-warp's bilinear gather is the one op in the training step XLA
cannot fuse into convolutions. The jnp path (gridsample.py) already recasts
it as one-hot contractions under ``lax.map``; this kernel runs the whole
thing inside VMEM with explicit blocking:

  forward :  out_c = rowsum((Y @ img_c) * X)        per (batch, row-block)
  backward:  dimg_c += contract_P(Y, X * g_c)       accumulated over blocks
             dpx = sum_c rowsum((Y @ img_c) * (X1 - X0)) * g_c
             dpy = sum_c rowsum(((Y1 - Y0) @ img_c) * X) * g_c

Y/X are the sparse row/column interpolation matrices built in-register
from iota compares; every heavy term is an MXU matmul, zeros padding is
free (out-of-range indices match no iota), and the backward produces
matmuls instead of scatters.

Mosaic layout rules respected throughout: channels ride a separate array
axis (never a sub-128 lane dim), broadcasts happen in 3-D (R, W, lane)
before collapsing leading dims, and per-query scalars use
(P, 1) -> (R, W) reshapes (both Mosaic-legal).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 8       # forward row block
BWD_BLOCK_ROWS = 4   # backward keeps ~4x more VMEM live per query
# Backward matmul precision knob. Measured on v5e: bf16 operands do NOT
# speed this kernel up (14.2 ms/step either way) — the cost is dominated
# by the VPU construction of the one-hot interpolation matrices (~21k
# VPU ops per query, invariant to matmul dtype), not the MXU contractions.
# Kept at f32 for exact gradient parity with the gather formulation.
BWD_DTYPE = jnp.float32
INTERPRET = False  # flipped by tests on CPU


def _onehots(coords, size, dtype=jnp.float32):
    """coords (R, Wq) -> (m0, m1, weighted_mat) each (P, size), P = R*Wq."""
    r, wq = coords.shape
    c0f = jnp.floor(coords)
    frac = (coords - c0f)[:, :, None]            # (R, Wq, 1)
    c0 = c0f.astype(jnp.int32)[:, :, None]       # (R, Wq, 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, wq, size), 2)
    h0 = (c0 == iota).astype(dtype)
    h1 = (c0 + 1 == iota).astype(dtype)
    mat = h0 * (1.0 - frac).astype(dtype) + h1 * frac.astype(dtype)
    return (h0.reshape(r * wq, size), h1.reshape(r * wq, size),
            mat.reshape(r * wq, size))


def _fwd_kernel(img_ref, px_ref, py_ref, out_ref, *, h, w, c):
    px = px_ref[0, 0]                            # (R, Wq)
    py = py_ref[0, 0]
    r, wq = px.shape
    _, _, ymat = _onehots(py, h)                 # (P, H)
    _, _, xmat = _onehots(px, w)                 # (P, W)
    for ci in range(c):
        rows = jnp.dot(ymat, img_ref[0, ci], preferred_element_type=jnp.float32)
        out = jnp.sum(rows * xmat, axis=1, keepdims=True)   # (P, 1)
        out_ref[0, 0, ci] = out.reshape(r, wq)


def _bwd_kernel(img_ref, px_ref, py_ref, g_ref, dimg_ref, dpx_ref, dpy_ref,
                *, h, w, c):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dimg_ref[0] = jnp.zeros_like(dimg_ref[0])

    px = px_ref[0, 0]
    py = py_ref[0, 0]
    r, wq = px.shape
    p = r * wq
    dt = BWD_DTYPE
    y0h, y1h, ymat = _onehots(py, h, dt)
    x0h, x1h, xmat = _onehots(px, w, dt)
    dymat = y1h - y0h      # exact in bf16 (entries are -1/0/1)
    dxmat = x1h - x0h
    xmat3 = xmat.reshape(r, wq, w)

    dpx = jnp.zeros((r, wq), jnp.float32)
    dpy = jnp.zeros((r, wq), jnp.float32)
    for ci in range(c):
        img = img_ref[0, ci].astype(dt)                       # (H, W)
        g = g_ref[0, 0, ci]                                   # (R, Wq)
        rows = jnp.dot(ymat, img, preferred_element_type=jnp.float32)
        tx = jnp.sum(rows * dxmat.astype(jnp.float32), axis=1,
                     keepdims=True).reshape(r, wq)
        dpx += tx * g
        drows = jnp.dot(dymat, img, preferred_element_type=jnp.float32)
        ty = jnp.sum(drows * xmat.astype(jnp.float32), axis=1,
                     keepdims=True).reshape(r, wq)
        dpy += ty * g
        # dimg_c += Y^T @ (X * g): contract the query dim of both operands
        gx = (xmat3 * g[:, :, None].astype(dt)).reshape(p, w)
        dimg_ref[0, ci] += jax.lax.dot_general(
            ymat, gx, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dpx_ref[0, 0] = dpx
    dpy_ref[0, 0] = dpy


def _blocked_coords(px, py, wq, block_rows):
    """(B, Hq, Wq) -> (B, n_blocks, block_rows, Wq), rows padded to a
    multiple of block_rows."""
    b, hq, _ = px.shape
    pad = (-hq) % block_rows
    if pad:
        px = jnp.pad(px, ((0, 0), (0, pad), (0, 0)))
        py = jnp.pad(py, ((0, 0), (0, pad), (0, 0)), constant_values=-10.0)
    n_blocks = (hq + pad) // block_rows
    return (px.reshape(b, n_blocks, block_rows, wq),
            py.reshape(b, n_blocks, block_rows, wq), n_blocks, pad)


def _sample_fwd_impl(image, px, py):
    b, h, w, c = image.shape
    bq, hq, wq = px.shape
    pxb, pyb, n_blocks, pad = _blocked_coords(px, py, wq, BLOCK_ROWS)
    img_chw = image.transpose(0, 3, 1, 2).astype(jnp.float32)  # (B, C, H, W)

    out = pl.pallas_call(
        partial(_fwd_kernel, h=h, w=w, c=c),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLOCK_ROWS, wq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLOCK_ROWS, wq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, c, BLOCK_ROWS, wq),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_blocks, c, BLOCK_ROWS, wq),
                                       jnp.float32),
        interpret=INTERPRET,
    )(img_chw, pxb, pyb)
    out = out.transpose(0, 1, 3, 4, 2).reshape(b, hq + pad, wq, c)
    return out[:, :hq].astype(image.dtype)


@jax.custom_vjp
def sample_bilinear_pallas(image, px, py):
    """Bilinear sample of NHWC ``image`` at pre-shifted pixel coordinates
    (px, py), zeros padding — matches grid_sample semantics after the
    wrapper applies the grid convention."""
    return _sample_fwd_impl(image, px, py)


def _vjp_fwd(image, px, py):
    return _sample_fwd_impl(image, px, py), (image, px, py)


def _vjp_bwd(residuals, g):
    image, px, py = residuals
    b, h, w, c = image.shape
    bq, hq, wq = px.shape
    pxb, pyb, n_blocks, pad = _blocked_coords(px, py, wq, BWD_BLOCK_ROWS)
    img_chw = image.transpose(0, 3, 1, 2).astype(jnp.float32)
    gpad = g.astype(jnp.float32)
    if pad:
        gpad = jnp.pad(gpad, ((0, 0), (0, pad), (0, 0), (0, 0)))
    gb = gpad.reshape(b, n_blocks, BWD_BLOCK_ROWS, wq, c).transpose(0, 1, 4, 2, 3)

    dimg, dpx, dpy = pl.pallas_call(
        partial(_bwd_kernel, h=h, w=w, c=c),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BWD_BLOCK_ROWS, wq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BWD_BLOCK_ROWS, wq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, BWD_BLOCK_ROWS, wq),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BWD_BLOCK_ROWS, wq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BWD_BLOCK_ROWS, wq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, n_blocks, BWD_BLOCK_ROWS, wq), jnp.float32),
            jax.ShapeDtypeStruct((b, n_blocks, BWD_BLOCK_ROWS, wq), jnp.float32),
        ],
        interpret=INTERPRET,
    )(img_chw, pxb, pyb, gb)

    dimg = dimg.transpose(0, 2, 3, 1).astype(image.dtype)
    dpx = dpx.reshape(b, hq + pad, wq)[:, :hq].astype(px.dtype)
    dpy = dpy.reshape(b, hq + pad, wq)[:, :hq].astype(py.dtype)
    return dimg, dpx, dpy


sample_bilinear_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def grid_sample_pallas(image, x, y, align_corners: bool = False):
    """grid_sample-compatible wrapper (reference normalization
    2*(coord/size)-1 -> pixel-space half-pixel shift, zeros padding) over
    the Pallas sampler."""
    b, h, w, c = image.shape
    if align_corners:
        px = x * (w - 1) / w
        py = y * (h - 1) / h
    else:
        px = x - 0.5
        py = y - 0.5
    px = jnp.clip(px, -2.0, w + 1.0)
    py = jnp.clip(py, -2.0, h + 1.0)
    return sample_bilinear_pallas(image, px, py)
