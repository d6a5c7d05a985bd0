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
    (ops/dense_conv.py)."""
    features: int
    packed: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, fold=None):
        kernel = self.param("kernel", kaiming_normal,
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        if fold is not None:
            from ..ops.dense_conv import fused_dense_conv
            y = fused_dense_conv(x, fold[0], fold[1], kernel)
        elif self.packed and x.shape[1] % 2 == 0 and x.shape[2] % 4 == 0:
            y = packed_conv3x3(x, kernel, 2, 4)
        else:
            y = _plain_conv3x3(x, kernel)
        return y + bias.astype(y.dtype)


class BNFold(nn.Module):
    """BatchNorm that RETURNS the folded per-channel (scale, shift) instead
    of a normalized tensor, for fusion into the Pallas dense-conv kernel
    (relu(x*scale + shift) == relu(batchnorm(x))).

    Declares the exact variable set of ``nn.BatchNorm`` — params
    {scale, bias}, batch_stats {mean, var} — so the parameter tree, torch
    checkpoint import, and orbax checkpoints are identical whether or not
    the fused path is active. Statistics math mirrors flax: batch mean /
    mean-of-squares in f32, optional cross-shard pmean via ``axis_name``,
    running stats updated with momentum 0.9 (torch 0.1).
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train and not self.is_initializing():
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=(0, 1, 2))
            mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
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

    ``fused=True`` routes BN+ReLU+conv through the position-packed Pallas
    engine (ops/dense_conv.py) when the shape qualifies; the parameter
    tree is identical either way (BNFold declares nn.BatchNorm's exact
    variables)."""
    growth_rate: int
    dtype: Dtype = jnp.float32
    packed: bool = False
    axis_name: Any = None
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        if self.fused and _fusable(x):
            fold = BNFold(axis_name=self.axis_name, name="norm")(x, train)
            return Conv3x3(self.growth_rate, dtype=self.dtype,
                           name="conv")(x, fold=fold)
        y = _bn(train, self.dtype, "norm", self.axis_name)(x)
        y = nn.relu(y)
        return Conv3x3(self.growth_rate, packed=self.packed, dtype=self.dtype,
                       name="conv")(y)


class DenseBlock(nn.Module):
    """Iterative concat of dense layers. With ``upsample=True`` only the new
    features are returned (reference models.py:31-53)."""
    growth_rate: int
    n_layers: int
    upsample: bool = False
    dtype: Dtype = jnp.float32
    packed: bool = False
    axis_name: Any = None
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        new_features = []
        for j in range(self.n_layers):
            out = DenseLayer(self.growth_rate, dtype=self.dtype,
                             packed=self.packed, axis_name=self.axis_name,
                             fused=self.fused,
                             name=f"layers{j}")(x, train)
            x = jnp.concatenate([x, out], axis=-1)
            new_features.append(out)
        if self.upsample:
            return jnp.concatenate(new_features, axis=-1)
        return x


class TransitionDown(nn.Module):
    """BN -> ReLU -> 1x1 conv (same channels) -> 2x2 maxpool.
    Reference models.py:56-67."""
    dtype: Dtype = jnp.float32
    axis_name: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
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
    size, concat [up, skip]. Reference models.py:70-80."""
    out_channels: int
    dtype: Dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x, skip):
        y = nearest_upsample_2x(x)
        y = Conv3x3(self.out_channels, packed=self.packed, dtype=self.dtype,
                    name="conv")(y)
        y = center_crop(y, skip.shape[1], skip.shape[2])
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

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        # static_argnums=(2,) marks the `train` bool (args: self, x, train)
        block_cls = (nn.remat(DenseBlock, static_argnums=(2,))
                     if self.remat else DenseBlock)
        out = Conv3x3(self.out_chans_first_conv, packed=self.packed,
                      dtype=self.dtype, name="firstconv")(x)

        skips = []
        for i, n in enumerate(self.down_blocks):
            out = block_cls(self.growth_rate, n, dtype=self.dtype,
                            packed=self.packed, axis_name=self.axis_name,
                            fused=self.fused,
                            name=f"denseBlocksDown{i}")(out, train)
            skips.append(out)
            out = TransitionDown(dtype=self.dtype, axis_name=self.axis_name,
                                 name=f"transDownBlocks{i}")(out, train)

        out = block_cls(self.growth_rate, self.bottleneck_layers, upsample=True,
                        dtype=self.dtype, packed=self.packed,
                        axis_name=self.axis_name, fused=self.fused,
                        name="bottleneck")(out, train)

        for i, n in enumerate(self.up_blocks):
            skip = skips.pop()
            out = TransitionUp(out.shape[-1], dtype=self.dtype, packed=self.packed,
                               name=f"transUpBlocks{i}")(out, skip)
            out = block_cls(self.growth_rate, n,
                            upsample=(i < len(self.up_blocks) - 1),
                            dtype=self.dtype, packed=self.packed,
                            axis_name=self.axis_name, fused=self.fused,
                            name=f"denseBlocksUp{i}")(out, train)

        out = nn.Conv(self.n_classes, (1, 1), use_bias=True,
                      kernel_init=kaiming_normal, dtype=self.dtype,
                      name="finalConv")(out)
        return jnp.abs(out).astype(jnp.float32)


def FCDenseNet57(n_classes: int = 1, dtype=jnp.float32, remat: bool = False,
                 packed: bool = False, fused: bool = False) -> FCDenseNet:
    """The configuration used by the reference drivers (models.py:190-194)."""
    return FCDenseNet(down_blocks=(4, 4, 4, 4, 4), up_blocks=(4, 4, 4, 4, 4),
                      bottleneck_layers=4, growth_rate=12, out_chans_first_conv=48,
                      n_classes=n_classes, dtype=dtype, remat=remat,
                      packed=packed, fused=fused)


def FCDenseNet67(n_classes: int = 1, dtype=jnp.float32, remat: bool = False,
                 packed: bool = False, fused: bool = False) -> FCDenseNet:
    """Reference models.py:197-201."""
    return FCDenseNet(down_blocks=(5, 5, 5, 5, 5), up_blocks=(5, 5, 5, 5, 5),
                      bottleneck_layers=5, growth_rate=16, out_chans_first_conv=48,
                      n_classes=n_classes, dtype=dtype, remat=remat,
                      packed=packed, fused=fused)


def FCDenseNet103(n_classes: int = 1, dtype=jnp.float32, remat: bool = False,
                  packed: bool = False, fused: bool = False) -> FCDenseNet:
    """Reference models.py:204-208."""
    return FCDenseNet(down_blocks=(4, 5, 7, 10, 12), up_blocks=(12, 10, 7, 5, 4),
                      bottleneck_layers=15, growth_rate=16, out_chans_first_conv=48,
                      n_classes=n_classes, dtype=dtype, remat=remat,
                      packed=packed, fused=fused)


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
