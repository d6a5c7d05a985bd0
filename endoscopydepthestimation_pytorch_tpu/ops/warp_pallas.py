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
BWD_BLOCK_ROWS = 8   # backward row block at c=1; shrinks with channels
# Backward matmul precision knob. Measured on v5e: bf16 operands do NOT
# speed this kernel up (14.2 ms/step either way) — the cost is dominated
# by the VPU construction of the one-hot interpolation matrices (~21k
# VPU ops per query, invariant to matmul dtype), not the MXU contractions.
# Kept at f32 for exact gradient parity with the gather formulation.
BWD_DTYPE = jnp.float32
INTERPRET = False  # flipped by tests on CPU


def _fwd_rows(h: int, w: int, wq: int, c: int) -> int:
    """Forward block rows fitting the 16M scoped-VMEM budget: the live
    set is the two (P, h)/(P, w) tent matrices plus the resident image
    and output. Calibrated against measured limits (8 rows OK at
    256x320/c=2; 8 rows OOMs at 512x640)."""
    r = BLOCK_ROWS
    while r > 1 and r * wq * (h + w) * 4 + c * h * w * 8 > 13 * 2 ** 20:
        r //= 2
    return r


def _bwd_rows(h: int, w: int, wq: int, c: int) -> int:
    """Backward block rows under the same budget: 4 interpolation mats
    (~P*(2h+3w)*4 bytes incl. gx/xmat3 temporaries) plus the resident
    image + dimg (8*c*h*w bytes). The 16M cap is calibrated against
    measured limits: 8 rows OK at 256x320 c=1 (15.7M), OOM at c=2
    (26.5M); 2 rows OOM at 512x640 c=1 (19.1M)."""
    p_max = max(wq, (16_000_000 - 8 * c * h * w) // ((2 * h + 3 * w) * 4))
    r = BWD_BLOCK_ROWS
    while r > 1 and r * wq > p_max:
        r //= 2
    return r


def _tent(coords, size):
    """coords (R, Wq) -> (P, size) bilinear weight matrix, P = R*Wq:
    mat[p, i] = max(0, 1 - |coord_p - i|). Bit-identical to the two-one-hot
    construction (c - floor(c) is exact in f32) at roughly half the VPU
    ops, and exact for zeros padding: out-of-range rows are all zero."""
    r, wq = coords.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, wq, size), 2
                                    ).astype(jnp.float32)  # Mosaic: int iota only
    mat = jnp.maximum(1.0 - jnp.abs(coords[:, :, None] - iota), 0.0)
    return mat.reshape(r * wq, size)


def _pair(coords, size, dtype=jnp.float32):
    """coords (R, Wq) -> (mat, dmat) each (P, size): bilinear weights and
    their derivative d(mat)/d(coord) = onehot(floor+1) - onehot(floor).
    Two iota compares (a lane-roll of onehot(floor) cannot replace the
    second: floor == -1 must still produce the floor+1 hit at lane 0, and
    floor == size-1 the floor hit at lane size-1); mat is derived from
    (h0, dmat, frac) instead of a third weighted build."""
    r, wq = coords.shape
    c0f = jnp.floor(coords)
    frac = (coords - c0f)[:, :, None].astype(dtype)  # (R, Wq, 1)
    c0 = c0f.astype(jnp.int32)[:, :, None]           # (R, Wq, 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, wq, size), 2)
    h0 = (c0 == iota).astype(dtype)
    h1 = (c0 + 1 == iota).astype(dtype)
    dmat = h1 - h0
    mat = h0 + dmat * frac
    return mat.reshape(r * wq, size), dmat.reshape(r * wq, size)


def _fwd_kernel(img_ref, px_ref, py_ref, out_ref, *, h, w, c):
    px = px_ref[0, 0]                            # (R, Wq)
    py = py_ref[0, 0]
    r, wq = px.shape
    ymat = _tent(py, h)                          # (P, H)
    xmat = _tent(px, w)                          # (P, W)
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
    ymat, dymat = _pair(py, h, dt)
    xmat, dxmat = _pair(px, w, dt)
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


def _out_struct(shape, dtype, *operands):
    """ShapeDtypeStruct carrying the union of the operands' varying-axes
    set: under a vma-checked shard_map (jax >= 0.9) pallas_call requires
    out_shape.vma, and the sampler's outputs vary exactly like its inputs
    (pure per-shard compute, no collectives)."""
    vma = frozenset().union(*(jax.typeof(a).vma for a in operands))
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _sample_fwd_impl(image, px, py):
    b, h, w, c = image.shape
    bq, hq, wq = px.shape
    rows = _fwd_rows(h, w, wq, c)
    pxb, pyb, n_blocks, pad = _blocked_coords(px, py, wq, rows)
    img_chw = image.transpose(0, 3, 1, 2).astype(jnp.float32)  # (B, C, H, W)

    out = pl.pallas_call(
        partial(_fwd_kernel, h=h, w=w, c=c),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, wq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, wq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, c, rows, wq),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((b, n_blocks, c, rows, wq), jnp.float32,
                              image, px, py),
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
    return _bwd_impl(image, px, py, g)


def _bwd_impl(image, px, py, g):
    b, h, w, c = image.shape
    bq, hq, wq = px.shape
    rows = _bwd_rows(h, w, wq, c)
    pxb, pyb, n_blocks, pad = _blocked_coords(px, py, wq, rows)
    img_chw = image.transpose(0, 3, 1, 2).astype(jnp.float32)
    gpad = g.astype(jnp.float32)
    if pad:
        gpad = jnp.pad(gpad, ((0, 0), (0, pad), (0, 0), (0, 0)))
    gb = gpad.reshape(b, n_blocks, rows, wq, c).transpose(0, 1, 4, 2, 3)

    dimg, dpx, dpy = pl.pallas_call(
        partial(_bwd_kernel, h=h, w=w, c=c),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, wq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, wq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, rows, wq),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, wq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, wq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _out_struct((b, c, h, w), jnp.float32, image, px, py, g),
            _out_struct((b, n_blocks, rows, wq), jnp.float32, image, px, py, g),
            _out_struct((b, n_blocks, rows, wq), jnp.float32, image, px, py, g),
        ],
        interpret=INTERPRET,
    )(img_chw, pxb, pyb, gb)

    dimg = dimg.transpose(0, 2, 3, 1).astype(image.dtype)
    dpx = dpx.reshape(b, hq + pad, wq)[:, :hq].astype(px.dtype)
    dpy = dpy.reshape(b, hq + pad, wq)[:, :hq].astype(py.dtype)
    return dimg, dpx, dpy


sample_bilinear_pallas.defvjp(_vjp_fwd, _vjp_bwd)


@jax.custom_vjp
def sample_bilinear_pallas_grad_first(image, px, py):
    """Like ``sample_bilinear_pallas``, but image gradients flow ONLY
    through channel 0 — the other channels' cotangents are TREATED AS
    ZERO. For samplers whose extra channels feed non-differentiable
    consumers only (warp_depth's stacked mask -> hard >= 0.9 threshold,
    ops/geometry.py): one forward call amortizes the interpolation-matrix
    construction over all channels, while the backward stays
    single-channel and fits 8-row VMEM blocks (2x fewer grid steps)."""
    return _sample_fwd_impl(image, px, py)


def _vjp1_fwd(image, px, py):
    # residual keeps only channel 0 of the image (the rest never
    # contributes a gradient) plus the full channel count for re-padding
    return _sample_fwd_impl(image, px, py), (image[..., :1], px, py,
                                             image.shape[-1])


def _vjp1_bwd(residuals, g):
    img0, px, py, c = residuals
    dimg0, dpx, dpy = _bwd_impl(img0, px, py, g[..., :1])
    dimg = jnp.pad(dimg0, ((0, 0), (0, 0), (0, 0), (0, c - 1)))
    return dimg, dpx, dpy


sample_bilinear_pallas_grad_first.defvjp(_vjp1_fwd, _vjp1_bwd)


def grid_sample_pallas(image, x, y, align_corners: bool = False,
                       grad_first_only: bool = False):
    """grid_sample-compatible wrapper (reference normalization
    2*(coord/size)-1 -> pixel-space half-pixel shift, zeros padding) over
    the Pallas sampler. ``grad_first_only`` selects the channel-0-gradient
    variant (see sample_bilinear_pallas_grad_first)."""
    b, h, w, c = image.shape
    if align_corners:
        px = x * (w - 1) / w
        py = y * (h - 1) / h
    else:
        px = x - 0.5
        py = y - 0.5
    px = jnp.clip(px, -2.0, w + 1.0)
    py = jnp.clip(py, -2.0, h + 1.0)
    if grad_first_only and c > 1:
        return sample_bilinear_pallas_grad_first(image, px, py)
    return sample_bilinear_pallas(image, px, py)
