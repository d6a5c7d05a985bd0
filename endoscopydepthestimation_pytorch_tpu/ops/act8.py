"""fp8 (e4m3) compressed-activation backward for dense blocks.

The canonical train step is HBM-bandwidth-bound (105.6 GB/step, 73% of
the v5e peak — PERF.md roofline) and the MXU is ~2% utilized, so
recomputation is nearly free while every byte saved across the
forward→backward boundary is a real win, and at 512x640 the saved
activations are what cap the per-chip batch at 4. This module shrinks a
dense block's saved residuals to ONE fp8 copy of the block input:

- **forward**: the exact materialized block math (identical to the
  default path up to compiler rounding — same folded-BN/ReLU/conv chain
  as ``ops/dense_block._block_impl``, with ``jnp.concatenate`` instead
  of the measured-slow aliased-buffer appends; standalone jitted
  forwards measure bit-identical, and inside value_and_grad the fusion
  context shifts values by a few ulps). Alongside, an e4m3 copy of the
  block input with a per-channel dynamic scale is saved as the
  custom-VJP residual.
- **backward**: dequantize the fp8 input and REPLAY the block forward
  from it inside the backward program (``jax.vjp`` over the pure block),
  so all intra-block activations are rematerialized from a half-width
  save. The returned gradients are the exact block's gradients evaluated
  at the compressed input — the quantization error is CONTAINED within
  each block, because every block's input is the previous block's exact
  output.

Why not quantize the forward (straight-through QAT)? Measured negative
result (round 3): quantize-dequantizing every concat segment in the
forward makes the full-model gradient CHAOTIC — cosine vs the exact
gradient 0.10-0.78, varying with the compilation context, because the
fp8 step function amplifies 1-ulp differences (BN reduction order,
fusion-dependent rounding) into full bucket flips, and the SFL/DCL
ratio losses amplify forward noise into the cotangent seeds. The
block-contained compression keeps the forward (and therefore the loss,
the BN running stats, and inference) EXACT; only ∂loss/∂θ picks up a
small, per-block-bounded deviation (full-model gradient cosine ≥ 0.99,
tests/test_act8.py).

This is OUTSIDE strict reference parity for gradients only (the
reference saves exact fp32 activations); it is gated behind
``FCDenseNet(act8=True)`` / ``train.py --act8`` with its own accuracy
study. Reference block semantics: models.py:19-53.

Numerics note kept from the QAT experiment (still load-bearing): scales
target ±240, IEEE e4m3's max, NOT e4m3fn's ±448 — any machinery that
round-trips saves through ``reduce_precision(exp=4, mant=3)`` maps
values in (240, 448] to inf (e4m3fn has no inf, so they come back NaN).
The custom-VJP residuals are carried as real f8 arrays today, but the
one-bit headroom costs ~nothing and survives future lowering changes.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

F8 = jnp.float8_e4m3fn
# IEEE e4m3 max (not e4m3fn's 448); see module docstring.
_F8_MAX = 240.0


def quantize8(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel dynamic-scale e4m3 quantization. Returns (q, scale)
    with ``|x / scale| <= 240``; scale is f32, shape (C,)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=tuple(range(x.ndim - 1)))
    s = jnp.maximum(amax / _F8_MAX, 1e-12)
    return (xf / s).astype(F8), s


def dequantize8(q: jnp.ndarray, s: jnp.ndarray, dtype) -> jnp.ndarray:
    return (q.astype(jnp.float32) * s).astype(dtype)


def _shape_token(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-size array whose SHAPE statically carries ``(0,) + x.shape``
    and whose dtype carries ``x.dtype`` — lets the backward reconstruct
    the tensor from a flattened residual without storing metadata."""
    return jnp.zeros((0,) + x.shape, x.dtype)


def _store_dense(q: jnp.ndarray) -> jnp.ndarray:
    """Flatten an fp8 residual to 1-D for HBM storage.

    At model shapes the residual is tiled ``T(8,128)(4,1)`` with the
    channel dim padded to 128 lanes — at C=48 that is a 2.7x physical
    expansion (measured: the 512x640 act8 OOM dump shows
    f8e4m3fn[8,512,640,48] allocated at 320M for 120M of payload), which
    erases fp8's capacity win. A 1-D store is lane-dense (pad < 4 KiB).
    The relayout copy costs one extra read+write of the tensor per
    direction; act8 is a capacity lever, not a bandwidth one, so that is
    the right trade.

    The ``optimization_barrier`` is load-bearing: the residual's
    producer (this reshape) and consumer (``_load_dense``'s reshape
    back) live in ONE jit program, and without the barrier XLA's
    algebraic simplifier cancels reshape∘reshape and carries the padded
    4-D buffer again — measured: identical 18.99G OOM totals with and
    without the plain reshape."""
    return lax.optimization_barrier(q.reshape(-1))


def _load_dense(q: jnp.ndarray, token: jnp.ndarray) -> jnp.ndarray:
    return q.reshape(token.shape[1:])


def _stats(x: jnp.ndarray, axis_name: Optional[str]):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(0, 1, 2))
    m2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
    if axis_name is not None:
        mu = lax.pmean(mu, axis_name)
        m2 = lax.pmean(m2, axis_name)
    return mu, m2


def _conv(x, kernel):
    return lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _mat_impl(dims, x, gammas, betas, kernels, biases):
    """Materialized-concat dense block (the fast XLA layout): same math as
    ``dense_block._block_impl`` — folded BN (biased variance, eps), ReLU,
    3x3 conv, per-segment batch statistics computed once — but the
    growing concat is built with ``jnp.concatenate`` (measured ~170 GB/s)
    instead of aliased dynamic_update_slice appends (measured 8-17 GB/s).
    Returns (buffer, mean, mean_sq) like dense_block_apply."""
    growth, n_layers, eps, axis_name = dims
    dt = x.dtype
    buf = x
    mu, m2 = _stats(x, axis_name)
    for j in range(n_layers):
        inv = lax.rsqrt(m2 - jnp.square(mu) + eps)
        scale = gammas[j] * inv
        shift = betas[j] - mu * scale
        a = jnp.maximum(buf * scale.astype(dt) + shift.astype(dt),
                        jnp.zeros((), dt))
        y = _conv(a, kernels[j].astype(dt))
        y = (y + biases[j].astype(y.dtype)).astype(dt)
        buf = jnp.concatenate([buf, y], axis=-1)
        s_mu, s_m2 = _stats(y, axis_name)
        mu = jnp.concatenate([mu, s_mu])
        m2 = jnp.concatenate([m2, s_m2])
    return buf, mu, m2


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def compressed_call(fn, x, *args):
    """Generic exact-forward / fp8-compressed-backward wrapper.

    ``fn(x, *args)`` runs exactly in the forward; the custom VJP saves an
    e4m3 copy of the BIG operand ``x`` (plus the small ``args`` — folded
    BN vectors, kernels, biases) and replays ``fn`` from the dequantized
    copy in the backward. Used for the transition layers and the final
    conv, whose inputs are the block outputs — the largest per-level
    tensors, otherwise saved in bf16 across the whole forward→backward
    gap. ``fn`` must be a module-level (stably hashable) callable.
    """
    return fn(x, *args)


def _cc_fwd(fn, x, *args):
    q, s = quantize8(x)
    return fn(x, *args), (_store_dense(q), s, _shape_token(x), args)


def _cc_bwd(fn, res, cot):
    q, s, dt_token, args = res
    xt = dequantize8(_load_dense(q, dt_token), s, dt_token.dtype)
    _, vjp = jax.vjp(fn, xt, *args)
    return vjp(cot)


compressed_call.defvjp(_cc_fwd, _cc_bwd)


def td_apply(x, scale, shift, kernel, bias):
    """TransitionDown body (reference models.py:56-67): folded-BN affine,
    ReLU, 1x1 conv (as a lane contraction), 2x2 max-pool."""
    dt = x.dtype
    a = jnp.maximum(x * scale.astype(dt) + shift.astype(dt),
                    jnp.zeros((), dt))
    y = lax.dot_general(a, kernel[0, 0].astype(dt), (((3,), (0,)), ((), ())))
    y = y + bias.astype(y.dtype)
    # flax nn.max_pool((2, 2), strides=(2, 2)) semantics
    return lax.reduce_window(y, -jnp.inf, lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def tu_apply(x, kernel, bias):
    """TransitionUp body (reference models.py:70-80): nearest-x2 upsample,
    3x3 SAME conv."""
    y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    y = _conv(y, kernel.astype(y.dtype))
    return y + bias.astype(y.dtype)


def conv1x1_apply(x, kernel, bias):
    """Final 1x1 conv (reference models.py:131,186)."""
    y = lax.dot_general(x, kernel[0, 0].astype(x.dtype),
                        (((3,), (0,)), ((), ())))
    return y + bias.astype(y.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def act8_block_apply(dims, x, gammas, betas, kernels, biases):
    """Train-mode dense block with fp8-compressed saved activations.

    dims: (growth, n_layers, eps, axis_name) — static.
    x: (B, H, W, c0) block input; gammas/betas per-layer BN params
    (layer j is (c0 + j*growth,)); kernels per-layer
    (3, 3, c0 + j*growth, growth); biases (growth,).

    Returns (buffer, mean, mean_sq) — identical VALUES to the default
    materialized path (the forward is exact); only the backward differs
    (replayed from the fp8 input copy).
    """
    return _mat_impl(dims, x, gammas, betas, kernels, biases)


# Trace-time switch between the two block backward modes (consistent
# between fwd and bwd within one trace; an A/B knob for the hardware
# measurement — scripts/ab_step.py):
#
# - "replay"    (default): save an e4m3 copy of the block INPUT only
#   (c0 channels — the minimal-memory mode, half of plain remat's bf16
#   block-input save; the 512x640 batch-8 target) and replay the whole
#   block via jax.vjp in the backward. Remat-like backward cost.
# - "saved_buf": save the WHOLE buffer at e4m3 (ctot channels ≈ byte
#   parity with remat's bf16 input save) plus the exact f32 statistics;
#   the backward is dense_block's prefix-recompute rule evaluated at the
#   dequantized buffer — every layer linearizes at an e4m3-accurate
#   input (no intra-block error compounding) and no conv is recomputed.
#   Measured full-model grad cos 0.9839 vs replay's 0.9804 (32x32/b8,
#   transitions compressed in both).
BWD_MODE = "replay"


def _act8_fwd(dims, x, gammas, betas, kernels, biases):
    buf, mu, m2 = _mat_impl(dims, x, gammas, betas, kernels, biases)
    if BWD_MODE == "saved_buf":
        q, s = quantize8(buf)
        return (buf, mu, m2), (_store_dense(q), s, _shape_token(buf), mu, m2,
                               gammas, betas, kernels, biases)
    q, s = quantize8(x)
    # zero-size shape/dtype token: residuals must be arrays, not metadata
    return (buf, mu, m2), (_store_dense(q), s, _shape_token(x),
                           gammas, betas, kernels, biases)


def _act8_bwd(dims, res, cot):
    if BWD_MODE == "saved_buf":
        q, s, dt_token, mu, m2, gammas, betas, kernels, biases = res
        buft = dequantize8(_load_dense(q, dt_token), s, dt_token.dtype)
        from .dense_block import _block_bwd
        return _block_bwd(dims,
                          (buft, mu, m2, gammas, betas, kernels, biases),
                          cot)
    q, s, dt_token, gammas, betas, kernels, biases = res
    xt = dequantize8(_load_dense(q, dt_token), s, dt_token.dtype)
    _, vjp = jax.vjp(
        lambda x_, g_, b_, k_, bi_: _mat_impl(dims, x_, g_, b_, k_, bi_),
        xt, gammas, betas, kernels, biases)
    return vjp(cot)


act8_block_apply.defvjp(_act8_fwd, _act8_bwd)
