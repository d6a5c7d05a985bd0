"""FC-DenseNet depth networks (layer L3a) in Flax, NHWC.

Architecture parity with the reference (models.py:19-208): pre-activation
BN+ReLU+3x3conv dense layers, no dropout, 1x1-conv+maxpool transition-down,
nearest-x2-upsample+3x3-conv transition-up (no transposed conv — kills grid
artifacts), |final 1x1 conv| head producing nonnegative depth.

TPU-native choices: NHWC layout throughout (XLA's preferred conv layout),
optional bfloat16 compute with float32 parameters/statistics, channel
concatenation on the trailing axis so XLA fuses the dense-block concats.

Module names intentionally mirror the reference's attribute names so torch
checkpoints map 1:1 (see models/torch_import.py).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Kaiming-normal fan_in for ReLU (reference utils.py:655-671: torch
# kaiming_normal_(mode="fan_in", nonlinearity="relu") => std=sqrt(2/fan_in))
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
glorot_normal = nn.initializers.variance_scaling(1.0, "fan_avg", "normal")

Dtype = Any


def _pack_weights_2d(w, dy: int, dx: int):
    """Shifted-weight packing: one (kh, kw) kernel becomes a
    (kh+dy-1, kw+dx-1) kernel with dy*dx*Cout output channels, one shifted
    copy per output-pixel offset inside a (dy, dx) tile."""
    wide = []
    for ddy in range(dy):
        for ddx in range(dx):
            wide.append(jnp.pad(w, ((ddy, dy - 1 - ddy), (ddx, dx - 1 - ddx),
                                    (0, 0), (0, 0))))
    return jnp.concatenate(wide, axis=-1)


def _plain_conv3x3(x, kernel):
    # no preferred_element_type: the MXU accumulates in fp32 internally and
    # a fp32 output would make the conv adjoint reject the bf16 operands
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _packed_conv3x3_raw(x, kernel, dy: int, dx: int):
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    wp = _pack_weights_2d(kernel, dy, dx)
    y = jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype), window_strides=(dy, dx),
        padding=((1, dy), (1, dx)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(n, h // dy, w // dx, dy, dx, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, cout)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def packed_conv3x3(x, kernel, dy: int = 2, dx: int = 4):
    """3x3 SAME conv evaluated as a strided (3+dy-1, 3+dx-1) conv whose
    output is the (dy, dx) space-to-depth of the true output.

    Why: the FC-DenseNet's growth-rate-12 convs leave the 128-wide MXU
    column tile ~9% utilized; packing dy*dx output positions into channels
    raises Cout to dy*dx*12 = 96 for a measured ~1.4x on v5e. Exact to
    float associativity.

    Backward: the adjoint of a *strided* conv is a dilated conv that XLA
    runs poorly; the custom VJP instead transposes the mathematically
    equal plain conv (conv is linear per operand — no extra forward).
    """
    return _packed_conv3x3_raw(x, kernel, dy, dx)


def _packed_conv3x3_fwd(x, kernel, dy, dx):
    return _packed_conv3x3_raw(x, kernel, dy, dx), (x, kernel)


def _packed_conv3x3_bwd(dy, dx, residuals, g):
    x, kernel = residuals
    g = g.astype(x.dtype)
    (dxv,) = jax.linear_transpose(lambda xx: _plain_conv3x3(xx, kernel), x)(g)
    (dwv,) = jax.linear_transpose(
        lambda kk: _plain_conv3x3(x, kk), kernel.astype(x.dtype))(g)
    return dxv, dwv.astype(kernel.dtype)


packed_conv3x3.defvjp(_packed_conv3x3_fwd, _packed_conv3x3_bwd)


class Conv3x3(nn.Module):
    """3x3 SAME conv with the same parameter tree as nn.Conv ('kernel',
    'bias'), dispatching to the packed evaluation when enabled and the
    spatial dims divide the packing tile. With ``fold=(scale, shift)`` the
    Pallas engine computes conv(relu(x*scale + shift)) in one fused pass
    (ops/dense_conv.py).

    ``x`` may also be a LIST of concat segments (with ``fold`` required):
    the conv is then evaluated as a sum of per-segment convs of
    relu(seg*scale+shift) over kernel channel slices — mathematically the
    conv of the materialized concat, without ever writing the concat
    (channel-dim concatenates measured at 168 GB/s are the single biggest
    cost of the step; see PERF.md round-2 profile)."""
    features: int
    packed: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, fold=None, raw: bool = False):
        segments = x if isinstance(x, (list, tuple)) else None
        cin = (sum(s.shape[-1] for s in segments) if segments is not None
               else (x if isinstance(x, int) else x.shape[-1]))
        kernel = self.param("kernel", kaiming_normal,
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if raw:
            return kernel, bias
        if segments is not None:
            assert fold is not None
            scale, shift = fold
            y = None
            off = 0
            for seg in segments:
                cs = seg.shape[-1]
                seg = seg.astype(self.dtype)
                a = nn.relu(seg * scale[off:off + cs].astype(seg.dtype)
                            + shift[off:off + cs].astype(seg.dtype))
                k = jax.lax.slice_in_dim(kernel, off, off + cs, axis=2)
                if self.packed and a.shape[1] % 2 == 0 and a.shape[2] % 4 == 0:
                    t = packed_conv3x3(a, k, 2, 4)
                else:
                    t = _plain_conv3x3(a, k)
                y = t if y is None else y + t
                off += cs
            return y + bias.astype(y.dtype)
        x = x.astype(self.dtype)
        if fold is not None:
            from ..ops.dense_conv import fused_dense_conv
            y = fused_dense_conv(x, fold[0], fold[1], kernel)
        elif self.packed and x.shape[1] % 2 == 0 and x.shape[2] % 4 == 0:
            y = packed_conv3x3(x, kernel, 2, 4)
        else:
            y = _plain_conv3x3(x, kernel)
        return y + bias.astype(y.dtype)


def segment_stats(x) -> tuple:
    """Per-channel batch (mean, mean-of-squares) of one concat segment, in
    f32. Segments appear as BN input in EVERY later dense layer; computing
    their statistics once and concatenating (BNFold ``stats=``) replaces
    the reference's per-layer re-reduction over the whole concat — same
    data, same reductions, ~4x fewer passes."""
    xf = x.astype(jnp.float32)
    return jnp.mean(xf, axis=(0, 1, 2)), jnp.mean(jnp.square(xf), axis=(0, 1, 2))


class BNFold(nn.Module):
    """BatchNorm that RETURNS the folded per-channel (scale, shift) instead
    of a normalized tensor, for fusion into the Pallas dense-conv kernel
    (relu(x*scale + shift) == relu(batchnorm(x))) and into the
    segment-decomposed dense layers.

    Declares the exact variable set of ``nn.BatchNorm`` — params
    {scale, bias}, batch_stats {mean, var} — so the parameter tree, torch
    checkpoint import, and orbax checkpoints are identical whether or not
    the fused path is active. Statistics math mirrors flax: batch mean /
    mean-of-squares in f32, optional cross-shard pmean via ``axis_name``,
    running stats updated with momentum 0.9 (torch 0.1).

    ``x`` may be the input tensor or just its channel count when
    precomputed ``stats=(mean, mean_of_squares)`` are supplied.
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Any = None

    @nn.compact
    def __call__(self, x, train: bool, stats=None, raw: bool = False):
        c = x if isinstance(x, int) else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if raw:
            # parameter access only (for the block-level custom VJP, which
            # folds/normalizes internally); no statistics update
            return scale, bias
        if train and not self.is_initializing():
            if stats is None:
                mu, mean2 = segment_stats(x)
            else:
                mu, mean2 = stats
            if self.axis_name is not None:
                mu = jax.lax.pmean(mu, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = mean2 - jnp.square(mu)
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mu)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var)
        else:
            mu, var = ra_mean.value, ra_var.value
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        return mul, bias - mu * mul


def _bn(train: bool, dtype: Dtype, name: str, axis_name=None) -> nn.BatchNorm:
    # torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (flax momentum=0.9).
    # axis_name: set to the mesh data axis inside shard_map so batch
    # statistics are psum'd across shards — preserving the global-BN
    # semantics the jit+shardings path gets from XLA automatically.
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        dtype=dtype, name=name, axis_name=axis_name)


def _fusable(x) -> bool:
    """The Pallas dense-conv engine applies when the batch is a multiple
    of 8 (octet sublanes) and the width splits into >= 2 position groups
    wide enough to matter (>= 80 px; smaller maps are sub-ms in XLA)."""
    return x.shape[0] % 8 == 0 and x.shape[2] % 8 == 0 and x.shape[2] >= 80


class DenseLayer(nn.Module):
    """BN -> ReLU -> 3x3 conv(growth_rate). Reference models.py:19-28.

    ``x`` may be a list of concat segments (with ``seg_stats`` the
    per-segment batch statistics): BN folds the concatenated statistics
    into per-channel (scale, shift) and the conv runs segment-decomposed
    (see Conv3x3) — exactly the BN+ReLU+conv of the materialized concat.

    ``fused=True`` routes BN+ReLU+conv through the position-packed Pallas
    engine (ops/dense_conv.py) when the shape qualifies; the parameter
    tree is identical in all modes (BNFold declares nn.BatchNorm's exact
    variables)."""
    growth_rate: int
    dtype: Dtype = jnp.float32
    packed: bool = False
    axis_name: Any = None
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool, seg_stats=None, raw: bool = False,
                 stats=None):
        if raw:
            # declare and return (gamma, beta, kernel, bias) for the
            # buffered block's custom VJP; x is the input channel count
            gb = BNFold(axis_name=self.axis_name, name="norm")(x, train, raw=True)
            kb = Conv3x3(self.growth_rate, dtype=self.dtype,
                         name="conv")(x, raw=True)
            return gb + kb
        if isinstance(x, int):
            # running-statistics update only (stats were computed inside
            # the buffered block's custom VJP, already cross-shard-reduced)
            BNFold(axis_name=None, name="norm")(x, train, stats=stats)
            return None
        if isinstance(x, (list, tuple)):
            mu = jnp.concatenate([s[0] for s in seg_stats])
            mean2 = jnp.concatenate([s[1] for s in seg_stats])
            fold = BNFold(axis_name=self.axis_name, name="norm")(
                sum(s.shape[-1] for s in x), train, stats=(mu, mean2))
            return Conv3x3(self.growth_rate, packed=self.packed,
                           dtype=self.dtype, name="conv")(list(x), fold=fold)
        if self.fused and _fusable(x):
            fold = BNFold(axis_name=self.axis_name, name="norm")(x, train)
            return Conv3x3(self.growth_rate, dtype=self.dtype,
                           name="conv")(x, fold=fold)
        if stats is not None:
            # materialized concat input with SHARED per-segment statistics
            # (computed once per segment at block level): folded BN affine
            # + ReLU + one whole-K conv. Skips the per-layer re-reduction
            # of the whole concat (reference recomputes identical stats
            # every layer; same data => same statistics).
            fold = BNFold(axis_name=self.axis_name, name="norm")(
                x.shape[-1], train, stats=stats)
            x = x.astype(self.dtype)
            a = nn.relu(x * fold[0].astype(x.dtype) + fold[1].astype(x.dtype))
            return Conv3x3(self.growth_rate, packed=self.packed,
                           dtype=self.dtype, name="conv")(a)
        y = _bn(train, self.dtype, "norm", self.axis_name)(x)
        y = nn.relu(y)
        return Conv3x3(self.growth_rate, packed=self.packed, dtype=self.dtype,
                       name="conv")(y)


class DenseBlock(nn.Module):
    """Iterative concat of dense layers. With ``upsample=True`` only the new
    features are returned (reference models.py:31-53).

    ``segmented=True`` (off by default; measured slower end-to-end, kept
    for A/B — PERF.md) keeps the growing concat as a LIST of
    segments threaded through the layers: the per-layer channel
    concatenates — pure HBM traffic at the measured 168 GB/s concat rate —
    are never materialized, and per-segment BN statistics are computed
    once instead of once per consuming layer. A non-upsample block then
    RETURNS the segment list; FCDenseNet threads it through transitions.
    The materialized path remains for the Pallas fused engine."""
    growth_rate: int
    n_layers: int
    upsample: bool = False
    dtype: Dtype = jnp.float32
    packed: bool = False
    axis_name: Any = None
    fused: bool = False
    segmented: bool = False
    buffered: bool = False
    block_packed: bool = False  # Pallas packed-block forward + recompute
    # backward (ops/dense_block_packed.py); falls back to materialized when
    # B % 8 != 0 or W % 8 != 0 (bottleneck level, tiny shard_map shards)
    block_engine: bool = False  # round-3 whole-block Pallas engine, forward
    # AND backward in Pallas (ops/block_engine.py); falls back to the
    # materialized path when the shape gate rejects (tiny levels, ragged
    # batches, deep 103-style blocks)
    with_stats: bool = False  # non-upsample blocks also return the output
    # concat's per-channel (mean, mean_sq) so TransitionDown can reuse them
    act8: bool = False  # fp8 (e4m3) compressed-activation backward
    # (ops/act8.py): the forward is the EXACT materialized block (values,
    # loss, BN stats, inference all bit-identical to the default path); a
    # block-level custom VJP saves only an e4m3 copy of the block input
    # and replays the block from it in the backward, so the saved
    # residuals shrink to half-width at one-channel-set size. Gradients
    # (only) deviate within a per-block-contained quantization envelope —
    # outside strict reference parity, own accuracy study in
    # tests/test_act8.py

    def _block_vjp_path(self, x, train: bool):
        """Shared plumbing of the block-level custom-VJP modes
        (``buffered``: XLA append buffer; ``block_packed``: Pallas packed
        forward; ``act8``: exact forward + fp8-compressed backward).
        Returns None when the gate does not apply."""
        if not (train and not self.fused and not self.segmented
                and not self.is_initializing()):
            return None
        if not (self.buffered or self.block_packed or self.block_engine
                or self.act8):
            return None
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate([s.astype(self.dtype) for s in x], axis=-1)
        x = x.astype(self.dtype)
        b, hh, ww, c0 = x.shape
        from ..ops.block_engine import supported as engine_ok
        use_engine = self.block_engine and engine_ok(b, hh, ww, self.n_layers)
        if self.block_engine and not use_engine and not (
                self.buffered or self.block_packed or self.act8):
            # engine shape gate rejected (tiny levels, ragged batches,
            # per-shard slivers) — fall back to the materialized path
            return None
        if self.block_packed and not (b % 8 == 0 and ww % 8 == 0):
            # packed layout wants batch octets and whole position groups
            # (e.g. the 16x20 bottleneck, or tiny per-shard batches under
            # shard_map) — fall back to the materialized path
            if not self.buffered:
                return None
        g = self.growth_rate
        layers = [DenseLayer(g, dtype=self.dtype, axis_name=self.axis_name,
                             name=f"layers{j}") for j in range(self.n_layers)]
        params = [layers[j](c0 + j * g, train, raw=True)
                  for j in range(self.n_layers)]
        dims = (g, self.n_layers, 1e-5,
                self.axis_name if isinstance(self.axis_name, str) else None)
        if use_engine:
            from ..ops.block_engine import block_engine_apply as apply_fn
        elif self.block_packed and b % 8 == 0 and ww % 8 == 0:
            from ..ops.dense_block_packed import packed_block_apply as apply_fn
        elif self.act8:
            from ..ops.act8 import act8_block_apply as apply_fn
        else:
            from ..ops.dense_block import dense_block_apply as apply_fn
        buf, mu, m2 = apply_fn(
            dims, x,
            tuple(p[0] for p in params), tuple(p[1] for p in params),
            tuple(p[2] for p in params), tuple(p[3] for p in params))
        return buf, mu, m2, layers, c0

    @nn.compact
    def __call__(self, x, train: bool):
        res = self._block_vjp_path(x, train)
        if res is not None:
            buf, mu, m2, layers, c0 = res
            g = self.growth_rate
            for j in range(self.n_layers):
                cj = c0 + j * g
                layers[j](cj, train, stats=(mu[:cj], m2[:cj]))
            if self.upsample:
                return jax.lax.slice_in_dim(buf, c0, buf.shape[-1], axis=3)
            if self.with_stats:
                return buf, (mu, m2)
            return buf
        if self.segmented and not self.fused:
            # Segment granularity matters: per-12-channel-segment convs are
            # K=12 MXU-starved and read misaligned (measured 4-5 TF/s, 2.7x
            # slower step). Keep the block INPUT segments separate (never
            # re-materialized into the giant concat) but merge the new
            # growth-12 features into one growing tensor via cheap <= 36ch
            # concats, so each layer runs a few decent-K convs.
            segments = list(x) if isinstance(x, (list, tuple)) else [x]
            stats = [segment_stats(s) for s in segments]
            newcat, newstats = None, None
            for j in range(self.n_layers):
                segs_in = segments + ([newcat] if newcat is not None else [])
                stats_in = stats + ([newstats] if newstats is not None else [])
                out = DenseLayer(self.growth_rate, dtype=self.dtype,
                                 packed=self.packed, axis_name=self.axis_name,
                                 name=f"layers{j}")(segs_in, train, stats_in)
                out_stats = segment_stats(out)
                if newcat is None:
                    newcat, newstats = out, out_stats
                else:
                    newcat = jnp.concatenate([newcat, out], axis=-1)
                    newstats = (jnp.concatenate([newstats[0], out_stats[0]]),
                                jnp.concatenate([newstats[1], out_stats[1]]))
            if self.upsample:
                return newcat  # == the concat of the new features
            return segments + [newcat]
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate([s.astype(self.dtype) for s in x], axis=-1)
        new_features = []
        # per-segment statistics, computed once when a segment is produced
        # and concatenated forward (1-D vectors) — the folded-BN layers
        # then skip the reference's per-layer whole-concat re-reduction
        stats = segment_stats(x)
        for j in range(self.n_layers):
            out = DenseLayer(self.growth_rate, dtype=self.dtype,
                             packed=self.packed, axis_name=self.axis_name,
                             fused=self.fused, name=f"layers{j}")(
                x, train, stats=None if self.fused else stats)
            x = jnp.concatenate([x, out], axis=-1)
            so = segment_stats(out)
            stats = (jnp.concatenate([stats[0], so[0]]),
                     jnp.concatenate([stats[1], so[1]]))
            new_features.append(out)
        if self.upsample:
            return jnp.concatenate(new_features, axis=-1)
        if self.with_stats:
            return x, stats
        return x


class Conv1x1(nn.Module):
    """1x1 conv over a segment list with nn.Conv's exact parameter tree
    ({kernel: (1,1,Cin,Cout), bias}): one dot_general per segment over the
    kernel's channel slice, summed — the 1x1 conv of the virtual concat.
    ``pre`` optionally applies relu(seg*scale+shift) per segment first."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, segments, pre=None, raw: bool = False):
        cin = (segments if isinstance(segments, int)
               else sum(s.shape[-1] for s in segments))
        kernel = self.param("kernel", kaiming_normal,
                            (1, 1, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if raw:
            # parameter access for the act8 compressed transitions — the
            # tree ({kernel: (1,1,Cin,Cout), bias}) is nn.Conv's exactly
            return kernel, bias
        y = None
        off = 0
        for seg in segments:
            cs = seg.shape[-1]
            seg = seg.astype(self.dtype)
            if pre is not None:
                scale, shift = pre
                seg = nn.relu(seg * scale[off:off + cs].astype(seg.dtype)
                              + shift[off:off + cs].astype(seg.dtype))
            k = kernel[0, 0, off:off + cs].astype(seg.dtype)
            t = jax.lax.dot_general(seg, k, (((3,), (0,)), ((), ())))
            y = t if y is None else y + t
            off += cs
        return y + bias.astype(y.dtype)


class TransitionDown(nn.Module):
    """BN -> ReLU -> 1x1 conv (same channels) -> 2x2 maxpool.
    Reference models.py:56-67. Accepts a dense block's segment list and
    evaluates BN/conv segment-decomposed (concat never materialized).

    ``act8=True`` (train mode): the body runs through
    ``ops.act8.compressed_call`` so the backward replays from an e4m3
    copy of the input — the input here is the producing block's OUTPUT
    concat, the largest tensor of its level, otherwise saved in bf16."""
    dtype: Dtype = jnp.float32
    axis_name: Any = None
    act8: bool = False

    @nn.compact
    def __call__(self, x, train: bool, stats=None):
        if (self.act8 and stats is not None and train
                and not self.is_initializing()):
            from ..ops.act8 import compressed_call, td_apply
            fold = BNFold(axis_name=self.axis_name, name="norm")(
                x.shape[-1], train, stats=stats)
            kernel, bias = Conv1x1(x.shape[-1], dtype=self.dtype,
                                   name="conv")(x.shape[-1], raw=True)
            return compressed_call(td_apply, x.astype(self.dtype),
                                   fold[0], fold[1], kernel, bias)
        if isinstance(x, (list, tuple)):
            c = sum(s.shape[-1] for s in x)
            stats_list = [segment_stats(s) for s in x]
            mu = jnp.concatenate([s[0] for s in stats_list])
            mean2 = jnp.concatenate([s[1] for s in stats_list])
            fold = BNFold(axis_name=self.axis_name, name="norm")(
                c, train, stats=(mu, mean2))
            y = Conv1x1(c, dtype=self.dtype, name="conv")(list(x), pre=fold)
            return nn.max_pool(y, (2, 2), strides=(2, 2))
        if stats is not None:
            # reuse the producing block's per-channel statistics (same
            # tensor, same reduction) via the folded-BN affine
            fold = BNFold(axis_name=self.axis_name, name="norm")(
                x.shape[-1], train, stats=stats)
            x = x.astype(self.dtype)
            y = nn.relu(x * fold[0].astype(x.dtype) + fold[1].astype(x.dtype))
            y = nn.Conv(x.shape[-1], (1, 1), use_bias=True,
                        kernel_init=kaiming_normal, dtype=self.dtype,
                        name="conv")(y)
            return nn.max_pool(y, (2, 2), strides=(2, 2))
        y = _bn(train, self.dtype, "norm", self.axis_name)(x)
        y = nn.relu(y)
        y = nn.Conv(x.shape[-1], (1, 1), use_bias=True, kernel_init=kaiming_normal,
                    dtype=self.dtype, name="conv")(y)
        return nn.max_pool(y, (2, 2), strides=(2, 2))


def center_crop(x, target_h: int, target_w: int):
    """Center-crop spatial dims of an NHWC tensor. Reference models.py:93-97."""
    h, w = x.shape[1], x.shape[2]
    y0 = (h - target_h) // 2
    x0 = (w - target_w) // 2
    return x[:, y0:y0 + target_h, x0:x0 + target_w, :]


def nearest_upsample_2x(x):
    """Nearest-neighbor x2 upsample (torch nn.Upsample(mode='nearest'))."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class TransitionUp(nn.Module):
    """nearest-x2 upsample -> 3x3 conv, center-crop to the skip's spatial
    size, concat [up, skip]. Reference models.py:70-80. When the skip is a
    segment list the "concat" stays virtual: returns [up] + skip.

    ``act8=True`` (train mode): upsample+conv run through
    ``ops.act8.compressed_call`` — the backward replays from an e4m3 copy
    of ``x`` (the previous level's block output) instead of a bf16 save."""
    out_channels: int
    dtype: Dtype = jnp.float32
    packed: bool = False
    act8: bool = False
    segment_out: bool = False  # return [up, skip] WITHOUT concatenating,
    # for a following segment-decomposed block: the (up48|skip96) concat
    # at the full-res level pads to 256 lanes and re-reads 671 MB physical
    # per consuming layer; as separate segments each read is a 128-lane
    # 335 MB buffer and the 3.9 ms concat fusion disappears (round-4
    # profile). A/B'd by scripts/ab_step.py split_skip.

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        if (self.act8 and train and not self.packed
                and not isinstance(x, (list, tuple))
                and not self.is_initializing()):
            from ..ops.act8 import compressed_call, tu_apply
            kernel, bias = Conv3x3(self.out_channels, dtype=self.dtype,
                                   name="conv")(x.shape[-1], raw=True)
            y = compressed_call(tu_apply, x.astype(self.dtype), kernel, bias)
        else:
            y = nearest_upsample_2x(x)
            y = Conv3x3(self.out_channels, packed=self.packed,
                        dtype=self.dtype, name="conv")(y)
        if isinstance(skip, (list, tuple)):
            y = center_crop(y, skip[0].shape[1], skip[0].shape[2])
            return [y] + list(skip)
        y = center_crop(y, skip.shape[1], skip.shape[2])
        if self.segment_out:
            return [y, skip]
        return jnp.concatenate([y, skip], axis=-1)


class FCDenseNet(nn.Module):
    """Fully-convolutional DenseNet encoder-decoder.

    Reference models.py:100-187. Output is ``|conv1x1(features)|`` — a
    nonnegative up-to-scale depth map, NHWC with 1 channel.
    """
    down_blocks: Sequence[int] = (5, 5, 5, 5, 5)
    up_blocks: Sequence[int] = (5, 5, 5, 5, 5)
    bottleneck_layers: int = 5
    growth_rate: int = 16
    out_chans_first_conv: int = 48
    n_classes: int = 1
    dtype: Dtype = jnp.float32
    remat: bool = False  # rematerialize dense blocks in backward (the
    # standard memory fix for DenseNet's O(L^2) concat activations; trades
    # ~30% extra forward FLOPs for fitting batch 8 @ 256x320 in 16G HBM)
    packed: bool = False  # MXU shifted-weight packing for the 3x3 convs
    axis_name: Any = None  # mesh axis for cross-shard BN under shard_map
    fused: bool = False  # Pallas fused BN+ReLU+conv engine for dense layers
    segmented: bool = False  # segment-decomposed dense blocks (no concat
    # materialization; per-segment BN stats shared across layers). Measured
    # SLOWER on v5e than the materialized concats (233 vs 198 ms step):
    # sub-128-channel convs/tensors pay lane-padding traffic that outweighs
    # the saved concatenates. Kept for A/B; see PERF.md round 2.
    buffered: bool = False  # memory-efficient buffered dense blocks with a
    # block-level custom VJP (ops/dense_block.py). Measured SLOWER on v5e
    # (380 ms step): XLA lowers the misaligned-channel-offset
    # dynamic_update_slice as a full-buffer lane-shifting copy at ~14 GB/s
    # (197 ms of DUS). Kept for A/B; its backward structure (only the
    # final concat saved, manual BN-through-stats gradient) is reused by
    # the packed Pallas block. See PERF.md round 2.
    block_packed: bool = False  # Pallas packed-block dense blocks: forward
    # threads activations in the position-packed layout (one pack per
    # block, lane concats, BN+ReLU+conv fused in VMEM) and the backward is
    # the buffered block's prefix-recompute VJP (ops/dense_block_packed.py).
    block_engine: bool = False  # round-3 whole-block Pallas engine: no
    # concat ever materializes inside a block (growth segments live as
    # packed-96 side tensors), BN stats are kernel byproducts, and the
    # backward (dx/dseg/dW/BN sums) also runs in Pallas
    # (ops/block_engine.py). The default engine as of round 3.
    block_engine_levels: Any = None  # optional collection of block names
    # (e.g. ("denseBlocksDown0", "denseBlocksUp4")) restricting the engine
    # to those levels; None = every engine-eligible block. Lets the model
    # mix the Pallas engine (wins at some levels) with XLA blocks
    # (wins at others) — scanned by scripts/ab_engine_levels.py.
    segmented_levels: Any = None  # optional collection of block names to
    # segment-decompose individually (generalizes segmented_last_up);
    # scanned per level by scripts/ab_segmented_levels.py
    act8: bool = False  # fp8 (e4m3) compressed-activation backward in the
    # dense blocks (ops/act8.py): the forward is EXACT (values, loss,
    # inference identical to the default); each block's custom VJP saves
    # only an e4m3 copy of the block input and replays the block from it
    # in the backward — the saved-activation HBM bytes shrink to one
    # half-width channel set per block (the memory lever for 512x640
    # batches). Gradients deviate within a per-block quantization
    # envelope — outside strict reference numerics; accuracy study in
    # tests/test_act8.py.
    segmented_last_up: bool = False  # segment-decompose ONLY the final
    # (full-resolution, non-upsample) up block: its incremental concats
    # are the single most expensive op of the step (20.2 ms of the 180,
    # round-2 profile) while its input stays one whole-K tensor, so the
    # lane-tax penalty that makes whole-model segmentation lose is limited
    # to the small growing new-features tensor.
    split_last_skip: bool = False  # with segmented_last_up: the final
    # TransitionUp passes [up, skip] as separate segments instead of
    # materializing the 144-channel concat (which pads to 256 lanes at
    # full resolution — 671 MB physical re-read by every up4 layer; the
    # concat fusion itself is 3.9 ms in the round-4 profile). Trades the
    # concat away for a K-split of each up4 conv (48+96 vs one 144) —
    # hardware A/B decides (scripts/ab_step.py split_skip).

    def _segmented_at(self, name: str) -> bool:
        """Per-level segment-decomposition gate (``segmented_levels``)."""
        return self.segmented or (self.segmented_levels is not None
                                  and name in self.segmented_levels)

    def _engine_at(self, name: str) -> bool:
        """Per-level engine gate (see ``block_engine_levels``)."""
        return self.block_engine and (self.block_engine_levels is None
                                      or name in self.block_engine_levels)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        # static_argnums=(2,) marks the `train` bool (args: self, x, train)
        # act8 blocks manage their own saves (block-level custom VJP with
        # fp8 residuals) — remat-wrapping them would be redundant
        block_cls = (nn.remat(DenseBlock, static_argnums=(2,))
                     if self.remat and not self.act8 else DenseBlock)
        out = Conv3x3(self.out_chans_first_conv, packed=self.packed,
                      dtype=self.dtype, name="firstconv")(x)

        skips = []
        for i, n in enumerate(self.down_blocks):
            res = block_cls(self.growth_rate, n, dtype=self.dtype,
                            packed=self.packed, axis_name=self.axis_name,
                            fused=self.fused,
                            segmented=self._segmented_at(
                                f"denseBlocksDown{i}"),
                            buffered=self.buffered, act8=self.act8,
                            block_packed=self.block_packed,
                            block_engine=self._engine_at(
                                f"denseBlocksDown{i}"),
                            with_stats=not self._segmented_at(
                                f"denseBlocksDown{i}"),
                            name=f"denseBlocksDown{i}")(out, train)
            out, bstats = res if isinstance(res, tuple) else (res, None)
            skips.append(out)
            out = TransitionDown(dtype=self.dtype, axis_name=self.axis_name,
                                 act8=self.act8,
                                 name=f"transDownBlocks{i}")(out, train,
                                                             stats=bstats)

        out = block_cls(self.growth_rate, self.bottleneck_layers, upsample=True,
                        dtype=self.dtype, packed=self.packed,
                        axis_name=self.axis_name, fused=self.fused,
                        segmented=self._segmented_at("bottleneck"),
                        buffered=self.buffered, act8=self.act8,
                        block_packed=self.block_packed,
                        block_engine=self._engine_at("bottleneck"),
                        name="bottleneck")(out, train)

        for i, n in enumerate(self.up_blocks):
            skip = skips.pop()
            up_channels = (out.shape[-1] if not isinstance(out, (list, tuple))
                           else sum(s.shape[-1] for s in out))
            last = i == len(self.up_blocks) - 1
            out = TransitionUp(up_channels, dtype=self.dtype, packed=self.packed,
                               act8=self.act8,
                               segment_out=(last and self.split_last_skip
                                            and (self.segmented_last_up or
                                                 self._segmented_at(
                                                     f"denseBlocksUp{i}"))),
                               name=f"transUpBlocks{i}")(out, skip, train)
            out = block_cls(self.growth_rate, n,
                            upsample=not last,
                            dtype=self.dtype, packed=self.packed,
                            axis_name=self.axis_name, fused=self.fused,
                            segmented=(self._segmented_at(
                                           f"denseBlocksUp{i}") or
                                       (last and self.segmented_last_up)),
                            buffered=self.buffered, act8=self.act8,
                            block_packed=self.block_packed,
                            block_engine=self._engine_at(
                                f"denseBlocksUp{i}"),
                            name=f"denseBlocksUp{i}")(out, train)

        if isinstance(out, (list, tuple)):
            out = Conv1x1(self.n_classes, dtype=self.dtype,
                          name="finalConv")(list(out))
        elif self.act8 and train and not self.is_initializing():
            # the final conv's input is the last up block's full-res
            # output — the single largest activation; replay its backward
            # from an e4m3 copy like the transitions
            from ..ops.act8 import compressed_call, conv1x1_apply
            kernel, bias = Conv1x1(self.n_classes, dtype=self.dtype,
                                   name="finalConv")(out.shape[-1], raw=True)
            out = compressed_call(conv1x1_apply, out.astype(self.dtype),
                                  kernel, bias)
        else:
            out = nn.Conv(self.n_classes, (1, 1), use_bias=True,
                          kernel_init=kaiming_normal, dtype=self.dtype,
                          name="finalConv")(out)
        return jnp.abs(out).astype(jnp.float32)


def FCDenseNet57(n_classes: int = 1, dtype=jnp.float32, remat: bool = False,
                 packed: bool = False, fused: bool = False,
                 segmented: bool = False, buffered: bool = False,
                 block_packed: bool = False, **flags) -> FCDenseNet:
    """The configuration used by the reference drivers (models.py:190-194)."""
    return FCDenseNet(down_blocks=(4, 4, 4, 4, 4), up_blocks=(4, 4, 4, 4, 4),
                      bottleneck_layers=4, growth_rate=12, out_chans_first_conv=48,
                      n_classes=n_classes, dtype=dtype, remat=remat,
                      packed=packed, fused=fused, segmented=segmented,
                      buffered=buffered, block_packed=block_packed, **flags)


def FCDenseNet67(n_classes: int = 1, dtype=jnp.float32, remat: bool = False,
                 packed: bool = False, fused: bool = False,
                 segmented: bool = False, buffered: bool = False,
                 block_packed: bool = False, **flags) -> FCDenseNet:
    """Reference models.py:197-201."""
    return FCDenseNet(down_blocks=(5, 5, 5, 5, 5), up_blocks=(5, 5, 5, 5, 5),
                      bottleneck_layers=5, growth_rate=16, out_chans_first_conv=48,
                      n_classes=n_classes, dtype=dtype, remat=remat,
                      packed=packed, fused=fused, segmented=segmented,
                      buffered=buffered, block_packed=block_packed, **flags)


def FCDenseNet103(n_classes: int = 1, dtype=jnp.float32, remat: bool = False,
                  packed: bool = False, fused: bool = False,
                  segmented: bool = False, buffered: bool = False,
                  block_packed: bool = False, **flags) -> FCDenseNet:
    """Reference models.py:204-208."""
    return FCDenseNet(down_blocks=(4, 5, 7, 10, 12), up_blocks=(12, 10, 7, 5, 4),
                      bottleneck_layers=15, growth_rate=16, out_chans_first_conv=48,
                      n_classes=n_classes, dtype=dtype, remat=remat,
                      packed=packed, fused=fused, segmented=segmented,
                      buffered=buffered, block_packed=block_packed, **flags)


class UNetConvBlock(nn.Module):
    """(3x3 conv -> ReLU) x2. Reference models.py:267-284."""
    out_size: int
    padding: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = 1 if self.padding else 0
        x = nn.relu(nn.Conv(self.out_size, (3, 3), padding=pad, dtype=self.dtype,
                            kernel_init=kaiming_normal, name="conv0")(x))
        x = nn.relu(nn.Conv(self.out_size, (3, 3), padding=pad, dtype=self.dtype,
                            kernel_init=kaiming_normal, name="conv1")(x))
        return x


class UNet(nn.Module):
    """Alternative encoder-decoder kept for capability parity
    (reference models.py:211-264; unused by the reference drivers)."""
    out_channels: int = 1
    depth: int = 6
    wf: int = 6
    padding: bool = True
    up_mode: str = "upsample"  # 'upsample' (nearest-x2 + conv, TPU-friendly)
    # or 'upconv' (3x3 stride-2 transposed conv, reference models.py:288-291)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # UNet has no normalization layers
        if self.up_mode not in ("upsample", "upconv"):
            raise ValueError(f"unknown up_mode {self.up_mode!r}")
        blocks = []
        for i in range(self.depth):
            x = UNetConvBlock(2 ** (self.wf + i), self.padding, dtype=self.dtype,
                              name=f"down{i}")(x)
            if i != self.depth - 1:
                blocks.append(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        for i in reversed(range(self.depth - 1)):
            if self.up_mode == "upconv":
                # torch ConvTranspose2d(k=3, s=2, p=1, output_p=1) doubles
                # the spatial size; flax's SAME-padded stride-2 transpose
                # has the same geometry (reference models.py:288-291)
                up = nn.ConvTranspose(2 ** (self.wf + i), (3, 3),
                                      strides=(2, 2), padding="SAME",
                                      dtype=self.dtype,
                                      kernel_init=kaiming_normal,
                                      name=f"up{i}_conv")(x)
            else:
                up = nearest_upsample_2x(x)
                up = nn.Conv(2 ** (self.wf + i), (3, 3), padding=1,
                             dtype=self.dtype, kernel_init=kaiming_normal,
                             name=f"up{i}_conv")(up)
            bridge = blocks.pop()
            bridge = center_crop(bridge, up.shape[1], up.shape[2])
            x = UNetConvBlock(2 ** (self.wf + i), self.padding, dtype=self.dtype,
                              name=f"up{i}_block")(jnp.concatenate([up, bridge], -1))
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       kernel_init=kaiming_normal, name="last")(x)
