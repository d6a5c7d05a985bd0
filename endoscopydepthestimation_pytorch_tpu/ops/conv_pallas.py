"""Pallas TPU kernel: 3x3 conv for tiny output channel counts (prototype).

FC-DenseNet's growth-12 convolutions use 12 of the MXU's 128 output lanes;
XLA's conv runs them at ~4 TF/s real. This kernel packs DELTA horizontal
output positions into the matmul N dimension (Cout 12 -> 96) via
tap-accumulation:

  out[(y, 8q+d), c] = sum_{ky, kx} x[y+ky-1, 8q+d+kx-1] . w[ky, kx, :, c]

With kx' = d+kx-1 in [-1, 8], each (ky, kx') pair contributes one matmul
  A(ky, kx')  (R*G, Cin) @ Wp[ky, kx'] (Cin, DELTA*Cout)
where A is a shifted in-VMEM view of the input block and
Wp[ky, kx'][:, d*Cout + c] = w[ky, kx'-d+1, :, c] (zero outside the 3-tap
window). 30 matmuls per block, all MXU work, no im2col materialization.

The caller supplies input already activated (BN+ReLU) — the conv's zero
padding must surround the activated values — and this prototype is
forward-only.

STATUS: correct but NOT faster than XLA's conv (~4.3 ms vs 3.45 ms at
16x256x320, Cin 48). Measured reason: tap-accumulation splits the MXU
contraction dim into per-tap K = Cin (48 -> padded 128, 2.7x waste),
whereas XLA's conv contracts K = 9*Cin densely. The round-2 version needs
an in-VMEM im2col (K = 30*Cin, N = 96) — see PERF.md. Kept as the
documented starting point; covered by an interpret-mode parity test.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DELTA = 8        # horizontal output positions packed into N
BLOCK_ROWS = 16  # output rows per grid step (32 exceeds scoped VMEM)
INTERPRET = False


def pack_tap_weights(w) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (3, DELTA + 2, Cin, DELTA * Cout) tap table."""
    packed = [jnp.pad(w, ((0, 0), (d, DELTA - 1 - d), (0, 0), (0, 0)))
              for d in range(DELTA)]
    return jnp.concatenate(packed, axis=-1)  # kx' axis length DELTA + 2


def _kernel(x_ref, wp_ref, out_ref, *, g, cin, cout_packed):
    # x_ref: (1, 1, DELTA, BLOCK_ROWS + 2, G + 2, Cin) halo'd block with the
    #        column-within-group index LEADING (taps become pure slices)
    # wp_ref: (3, DELTA + 2, Cin, COUT_PACKED)
    # out_ref: (1, 1, BLOCK_ROWS, G, COUT_PACKED)
    r = out_ref.shape[2]
    xg = x_ref[0, 0]                               # (8, R+2, G+2, Cin)

    acc = jnp.zeros((r * g, cout_packed), jnp.float32)
    for ky in range(3):
        for kxp in range(-1, DELTA + 1):
            a = (kxp + DELTA) // DELTA - 1         # group shift
            b = (kxp + DELTA) % DELTA              # column inside group
            tap = xg[b, ky:ky + r, a + 1:a + 1 + g, :]   # (R, G, Cin)
            acc = acc + jnp.dot(tap.reshape(r * g, cin),
                                wp_ref[ky, kxp + 1],
                                preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc.reshape(r, g, cout_packed)


def conv3x3_small_cout(x: jnp.ndarray, wp: jnp.ndarray,
                       bias=None) -> jnp.ndarray:
    """SAME 3x3 conv via the packed Pallas kernel.

    x: (N, H, W, Cin) with W % DELTA == 0 and H % BLOCK_ROWS == 0.
    wp: pre-packed weights from pack_tap_weights.
    """
    n, h, wd, cin = x.shape
    cout_packed = wp.shape[-1]
    cout = cout_packed // DELTA
    assert wd % DELTA == 0 and h % BLOCK_ROWS == 0, (h, wd)
    g = wd // DELTA
    n_blocks = h // BLOCK_ROWS

    # zero-pad one row top/bottom and one full DELTA-group left/right so
    # the kx' = -1 / +DELTA taps stay group-aligned; move the
    # column-within-group index to a leading dim; pre-slice the
    # overlapping row windows (Pallas blocked indexing cannot overlap)
    xp = jnp.pad(x, ((0, 0), (1, 1), (DELTA, DELTA), (0, 0)))
    xp = xp.reshape(n, h + 2, g + 2, DELTA, cin).transpose(0, 3, 1, 2, 4)
    windows = jnp.stack([xp[:, :, j * BLOCK_ROWS:j * BLOCK_ROWS + BLOCK_ROWS + 2]
                         for j in range(n_blocks)], axis=1)
    # windows: (N, n_blocks, DELTA, R+2, G+2, Cin)

    out = pl.pallas_call(
        partial(_kernel, g=g, cin=cin, cout_packed=cout_packed),
        grid=(n, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, DELTA, BLOCK_ROWS + 2, g + 2, cin),
                         lambda i, j: (i, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, DELTA + 2, cin, cout_packed),
                         lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, BLOCK_ROWS, g, cout_packed),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_blocks, BLOCK_ROWS, g, cout_packed),
                                       jnp.float32),
        interpret=INTERPRET,
    )(windows, wp.astype(x.dtype))

    out = out.reshape(n, h, g, DELTA, cout).reshape(n, h, wd, cout)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
