"""Block-level packed dense block: Pallas forward, recompute backward.

Round-2 profile ground truth (PERF.md): at the XLA level the dense block
is bound by lane-tile traffic — the growing channel concats (39 ms/step)
and growth-12 convs (every sub-128-channel tensor pays ~128-lane physical
HBM traffic). The per-LAYER Pallas engine (ops/dense_conv.py) could not
beat that end-to-end because each call paid a pack/unpack transpose and a
custom-VJP fusion boundary.

This module runs the WHOLE block in the packed layout:

  forward:  pack the block input once -> for each layer, fold the BN
            affine from the shared per-segment statistics, run the
            position-packed kernel (BN+ReLU+conv fused), append the new
            12 features to the packed activation by a cheap lane concat
            (the packed tensor's rows are 128-lane aligned), compute the
            segment's batch statistics from the packed output -> unpack
            ONCE at block end into the materialized concat the rest of
            the network consumes. The NHWC incremental concats never
            exist.

  backward: block-level custom VJP saving only the final buffer + the
            statistics — ops/dense_block.py's prefix-recompute backward
            applies unchanged (any prefix of the final concat equals that
            layer's input; BN gradient through the batch statistics done
            manually). No Pallas in the backward yet: XLA's conv adjoints
            run at 20-26 TF/s (vs 10-13 forward), so the forward was the
            profitable half to move first.

Numerics: identical math to BN(concat)+ReLU+conv3x3 (folded batch norm,
biased variance, torch BatchNorm2d semantics); parity tested against the
materialized path in tests/test_dense_block.py. Reference: the block
semantics are models.py:19-53 of the upstream repo.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from . import dense_conv
from .dense_block import _block_bwd


def _fold(gamma, beta, mu, m2, eps):
    """Exact-width folded BN affine (f32): relu(x*scale + shift) ==
    relu(batchnorm(x)) with biased variance m2 - mu^2."""
    inv = lax.rsqrt(m2 - jnp.square(mu) + eps)
    scale = gamma * inv
    return scale, beta - mu * scale


def _pmean(v, axis_name):
    return lax.pmean(v, axis_name) if axis_name is not None else v


def _packed_impl(dims, x, gammas, betas, kernels, biases):
    growth, n_layers, eps, axis_name = dims
    b, h, w, c0 = x.shape
    dt = x.dtype

    xf = x.astype(jnp.float32)
    mu = _pmean(jnp.mean(xf, axis=(0, 1, 2)), axis_name)
    m2 = _pmean(jnp.mean(jnp.square(xf), axis=(0, 1, 2)), axis_name)

    xt = dense_conv.to_packed_layout(x)   # (B/8, 8d, H, G, 8b, c0)
    for j in range(n_layers):
        scale, shift = _fold(gammas[j], betas[j], mu, m2, eps)
        wp = dense_conv.pack_tap_weights(kernels[j].astype(dt))
        out = dense_conv.dense_conv_fwd_packed(xt, scale, shift, wp, growth)
        yt = dense_conv.packed_out_to_input_layout(out, growth)
        yt = (yt + biases[j].astype(yt.dtype)).astype(dt)
        yf = yt.astype(jnp.float32)
        s_mu = _pmean(jnp.mean(yf, axis=(0, 1, 2, 3, 4)), axis_name)
        s_m2 = _pmean(jnp.mean(jnp.square(yf), axis=(0, 1, 2, 3, 4)), axis_name)
        mu = jnp.concatenate([mu, s_mu])
        m2 = jnp.concatenate([m2, s_m2])
        xt = jnp.concatenate([xt, yt], axis=-1)

    buf = dense_conv.from_packed_layout(xt)
    return buf, mu, m2


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def packed_block_apply(dims, x, gammas, betas, kernels, biases):
    """Train-mode dense block, packed-Pallas forward.

    Same contract as dense_block.dense_block_apply: dims = (growth,
    n_layers, eps, axis_name) static; returns (buffer, mean, mean_sq)
    where buffer is the materialized block concat [x, y_1..y_L] and the
    statistics cover its channels (for the running-average updates in the
    flax module). Requires B % 8 == 0 and W % 8 == 0 (the caller gates)."""
    return _packed_impl(dims, x, gammas, betas, kernels, biases)


def _packed_fwd(dims, x, gammas, betas, kernels, biases):
    buf, mu, m2 = _packed_impl(dims, x, gammas, betas, kernels, biases)
    return (buf, mu, m2), (buf, mu, m2, gammas, betas, kernels, biases)


# Residuals and cotangents line up exactly with dense_block's buffered
# formulation (final buffer + stats + params), so its prefix-recompute
# backward is shared verbatim.
packed_block_apply.defvjp(_packed_fwd, _block_bwd)
