"""Pallas TPU engine for FC-DenseNet's growth-12 convolutions.

The dense layer BN -> ReLU -> conv3x3(growth=12) (reference models.py:19-28)
uses 12 of the MXU's 128 output lanes; XLA runs it at 5-12 TF/s (measured,
scripts/microbench_conv.py). This kernel packs DELTA=8 horizontal output
positions into the matmul N dimension (12 -> 96 lanes) and fuses the
BatchNorm affine + ReLU into the same VMEM pass:

  y[r, 8g+d, f] = sum_{ky, kxp} act[r+ky-1, 8g+kxp, :] . Wp[ky, kxp][:, 12d+f]
  act = relu(x * scale + shift)        (scale/shift = folded BN)

Layout (every step below was driven by a measured Mosaic constraint):

  * the caller provides x TRANSFORMED to (B/8, 8d, H, G, 8b, C): the
    within-group position d and 8 batch elements ride separate array
    axes. The 8 BATCH elements are the sublane dim - they are never
    shifted or indexed, so the row (ky) and group (a0) tap offsets land
    on UNTILED dims where slicing is free. (Group-on-sublanes cost a
    relayout per tap: measured 30-45 TF/s slot rate vs the ~170 TF/s
    this loop shape sustains with clean operands.)
  * the kernel materializes THREE group-shifted activated copies per
    block (one per column shift a0), so all 30 tap matmul operands are
    contiguous row slices.
  * the channel dim is K-blocked in 128-lane chunks via a third grid
    axis, with a persistent f32 accumulator scratch - VMEM stays
    bounded for any Cin (the dense-block concat grows to 372).

Backward (custom VJP) recomputes the activation and uses XLA's
conv adjoints (filter gradients there already run at 20-28 TF/s).

Parity: torch-conv semantics (tests/test_dense_conv.py, interpret mode on
CPU). Reference: models.py:19-28 (DenseLayer), models.py:100-187.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DELTA = 8          # output positions packed into the matmul N dim
N_TAPS = 3 * (DELTA + 2)
CK = 128           # K-chunk (lanes per channel block)
INTERPRET = False  # flipped by CPU tests


def _ceil(a: int, b: int) -> int:
    return -(-a // b)


def pack_tap_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, F) -> (30, ceil(C/128)*128, 8F) position-packed taps,
    channel dim zero-padded to whole K-chunks.

    wp[ky*10 + kxp+1, c, d*F + f] = w[ky, kxp - d + 1, c, f] when the
    column offset kxp falls inside output position d's 3-tap window.
    """
    _, _, c, f = w.shape
    cpad = _ceil(c, CK) * CK
    table = jnp.zeros((N_TAPS, cpad, DELTA * f), w.dtype)
    for ky in range(3):
        for kxp in range(-1, DELTA + 1):
            for d in range(DELTA):
                kx = kxp - d + 1
                if 0 <= kx <= 2:
                    table = table.at[ky * (DELTA + 2) + kxp + 1, :c,
                                     d * f:(d + 1) * f].set(w[ky, kx])
    return table


def _fwd_kernel(top_ref, mid_ref, bot_ref, scale_ref, shift_ref, wp_ref,
                out_ref, shm_ref, sh0_ref, sh2_ref, acc_ref, *, r, g, c, f):
    """One (batch-octet, row-block, K-chunk) grid step.

    top/bot_ref: (1, 8, 1, G, 8, CK) halo rows (index_map clamps at the
        border; stale data is replaced by zeros below)
    mid_ref: (1, 8, R, G, 8, CK)
    shm_ref: (8, R+2, G, 8, CK) the activated block; every interior tap is
        a contiguous leading-row slice of it
    sh0/sh2_ref: (R+2, G, 8, CK) the two boundary-shift copies — the
        kxp=-1 tap only reads position 7 and kxp=8 only position 0, so a
        single-position copy each (8x smaller than a full shifted copy)
    acc_ref: (R*G*8, 8F) f32 accumulator, persisted across K-chunks
    out_ref: (1, 1, R, G, 8, 8F), written on the last chunk
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    scale = scale_ref[0].astype(mid_ref.dtype)
    shift = shift_ref[0].astype(mid_ref.dtype)
    # lanes beyond C in the last chunk hold garbage (BlockSpec padding):
    # zero them post-activation (where also kills NaNs)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, CK), 4)
    valid = lane < (c - k * CK)

    def activate(v):
        v = v.astype(mid_ref.dtype)
        a = jnp.maximum(v * scale + shift, jnp.zeros((), v.dtype))
        return jnp.where(valid, a, jnp.zeros((), v.dtype))

    # piecewise ref stores (value-level concatenates kept several
    # block-sized temporaries alive and blew the scoped-VMEM budget)
    zero_row = jnp.zeros((DELTA, 1, g, DELTA, CK), mid_ref.dtype)
    shm_ref[:, 1:r + 1] = activate(mid_ref[0])
    shm_ref[:, 0:1] = jnp.where(j > 0, activate(top_ref[0]), zero_row)
    shm_ref[:, r + 1:r + 2] = jnp.where(j < n_j - 1, activate(bot_ref[0]),
                                        zero_row)
    # boundary-shift copies, ref-to-ref on the untiled G axis
    sh0_ref[:, 0:1] = jnp.zeros_like(sh0_ref[:, 0:1])
    sh0_ref[:, 1:g] = shm_ref[DELTA - 1, :, 0:g - 1]
    sh2_ref[:, g - 1:g] = jnp.zeros_like(sh2_ref[:, g - 1:g])
    sh2_ref[:, 0:g - 1] = shm_ref[0, :, 1:g]

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    nf = DELTA * f
    m = r * g * DELTA
    acc = acc_ref[...]
    for ky in range(3):
        for kxp in range(-1, DELTA + 1):
            a0 = (kxp + DELTA) // DELTA
            d = kxp % DELTA
            if a0 == 0:
                tap = sh0_ref[ky:ky + r]               # (R, G, 8b, CK)
            elif a0 == 2:
                tap = sh2_ref[ky:ky + r]
            else:
                tap = shm_ref[d, ky:ky + r]
            acc = acc + jnp.dot(tap.reshape(m, CK),
                                wp_ref[ky * (DELTA + 2) + kxp + 1],
                                preferred_element_type=jnp.float32)
    acc_ref[...] = acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[0, 0] = acc.reshape(r, g, DELTA, nf).astype(out_ref.dtype)


def _pick_rows(h: int, g: int) -> int:
    """Row-block size: M = R*G*8 around 1280-2560 within VMEM budget."""
    target = max(1, 128 // g)  # larger blocks exceed the VMEM budget (2x rows at g=20 OOMs: pipelining double-buffers the in/out blocks)
    r = 1
    for cand in range(1, h + 1):
        if h % cand == 0 and cand <= target:
            r = cand
    return r


def to_packed_layout(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B/8, 8d, H, G, 8b, C): group position and batch
    octet become array axes (one XLA transpose pass per layer input)."""
    b, h, w, c = x.shape
    assert b % DELTA == 0 and w % DELTA == 0, (b, w)
    g = w // DELTA
    xt = x.reshape(b // DELTA, DELTA, h, g, DELTA, c)
    return xt.transpose(0, 4, 2, 3, 1, 5)  # (B/8, 8d, H, G, 8b, C)


def from_packed_out(out: jnp.ndarray, b: int, h: int, w: int, f: int
                    ) -> jnp.ndarray:
    """(B/8, H/R, R, G, 8b, 8F) -> (B, H, W, F)."""
    b8 = out.shape[0]
    g = out.shape[3]
    y = out.reshape(b8, h, g, DELTA, DELTA, f)        # (B/8, H, G, 8b, 8d, F)
    y = y.transpose(0, 3, 1, 2, 4, 5)                 # (B/8, 8b, H, G, 8d, F)
    return y.reshape(b, h, w, f)


def from_packed_layout(xt: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``to_packed_layout``: (B/8, 8d, H, G, 8b, C) -> (B, H, W, C)."""
    b8, _, h, g, _, c = xt.shape
    x = xt.transpose(0, 4, 2, 3, 1, 5)  # (B/8, 8b, H, G, 8d, C)
    return x.reshape(b8 * DELTA, h, g * DELTA, c)


def packed_out_to_input_layout(out: jnp.ndarray, f: int) -> jnp.ndarray:
    """Kernel output (B/8, H/R, R, G, 8b, 8F) -> input layout
    (B/8, 8d, H, G, 8b, F), so a layer's output can be lane-concatenated
    onto the packed activation and fed to the next layer's kernel without
    leaving the packed world (ops/dense_block_packed.py)."""
    b8, hr, r, g, d, _ = out.shape
    y = out.reshape(b8, hr * r, g, d, DELTA, f)   # (B/8, H, G, 8b, 8d, F)
    return y.transpose(0, 4, 1, 2, 3, 5)          # (B/8, 8d, H, G, 8b, F)


def dense_conv_fwd_packed(xt: jnp.ndarray, scale: jnp.ndarray,
                          shift: jnp.ndarray, wp: jnp.ndarray, f: int
                          ) -> jnp.ndarray:
    """The packed-layout kernel body: xt (B/8, 8d, H, G, 8b, C) ->
    (B/8, H/R, R, G, 8b, 8F) raw kernel output (no layout transforms)."""
    _, _, h, g, _, c = xt.shape
    r = _pick_rows(h, g)
    n_k = _ceil(c, CK)
    cpad = n_k * CK
    nf = DELTA * f
    scale = jnp.pad(scale.astype(jnp.float32), (0, cpad - c)).reshape(1, cpad)
    shift = jnp.pad(shift.astype(jnp.float32), (0, cpad - c)).reshape(1, cpad)
    return _dense_conv_call(xt, scale, shift, wp, f, r, n_k)


def dense_conv_fwd(x: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray,
                   wp: jnp.ndarray, f: int) -> jnp.ndarray:
    """conv3x3(relu(x*scale + shift), w) for Cout = f via the packed
    Pallas kernel. x: (B, H, W, C), B % 8 == 0, W % 8 == 0."""
    b, h, w, c = x.shape
    xt = to_packed_layout(x)
    out = dense_conv_fwd_packed(xt, scale, shift, wp, f)
    return from_packed_out(out, b, h, w, f)


def _dense_conv_call(xt, scale, shift, wp, f, r, n_k):
    b8, _, h, g, _, c = xt.shape
    b = b8 * DELTA
    nf = DELTA * f

    out = pl.pallas_call(
        partial(_fwd_kernel, r=r, g=g, c=c, f=f),
        grid=(b // DELTA, h // r, n_k),
        in_specs=[
            pl.BlockSpec((1, DELTA, 1, g, DELTA, CK),
                         lambda i, j, k: (i, 0, jnp.maximum(j * r - 1, 0),
                                          0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DELTA, r, g, DELTA, CK),
                         lambda i, j, k: (i, 0, j, 0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DELTA, 1, g, DELTA, CK),
                         lambda i, j, k: (i, 0, jnp.minimum(j * r + r, h - 1),
                                          0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CK), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CK), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_TAPS, CK, nf), lambda i, j, k: (0, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, r, g, DELTA, nf),
                               lambda i, j, k: (i, j, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b // DELTA, h // r, r, g, DELTA, nf),
                                       xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((DELTA, r + 2, g, DELTA, CK), xt.dtype),
            pltpu.VMEM((r + 2, g, DELTA, CK), xt.dtype),
            pltpu.VMEM((r + 2, g, DELTA, CK), xt.dtype),
            pltpu.VMEM((r * g * DELTA, nf), jnp.float32),
        ],
        interpret=INTERPRET,
    )(xt, xt, xt, scale, shift, wp)

    return out


def _act(x, scale, shift):
    return jnp.maximum(x * scale + shift, 0.0).astype(x.dtype)


def _conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@partial(jax.custom_vjp, nondiff_argnums=())
def fused_dense_conv(x, scale, shift, w):
    """y = conv3x3(relu(x*scale + shift), w): the FC-DenseNet dense layer
    with the BatchNorm affine folded into (scale, shift).

    Forward runs the packed Pallas kernel; backward recomputes the
    activation and uses XLA's conv adjoints (filter grads there already
    run near their padding bound)."""
    wp = pack_tap_weights(w).astype(x.dtype)
    return dense_conv_fwd(x, scale.astype(jnp.float32),
                          shift.astype(jnp.float32), wp, w.shape[-1])


def _fused_fwd(x, scale, shift, w):
    return fused_dense_conv(x, scale, shift, w), (x, scale, shift, w)


def _fused_bwd(res, gy):
    x, scale, shift, w = res
    xf = x.astype(jnp.float32)
    a = _act(xf, scale.astype(jnp.float32)[None, None, None, :],
             shift.astype(jnp.float32)[None, None, None, :]).astype(x.dtype)
    gy = gy.astype(x.dtype)
    (da,) = jax.linear_transpose(lambda t: _conv_ref(t, w), a)(gy)
    (dw,) = jax.linear_transpose(
        lambda kk: _conv_ref(a, kk), w.astype(x.dtype))(gy)
    mask = (a > 0).astype(jnp.float32)
    da_m = da.astype(jnp.float32) * mask
    dx = (da_m * scale.astype(jnp.float32)[None, None, None, :]).astype(x.dtype)
    dscale = jnp.sum(da_m * xf, axis=(0, 1, 2)).astype(scale.dtype)
    dshift = jnp.sum(da_m, axis=(0, 1, 2)).astype(shift.dtype)
    return dx, dscale, dshift, dw.astype(w.dtype)


fused_dense_conv.defvjp(_fused_fwd, _fused_bwd)
