"""Pallas fused bilinear sampler vs the XLA gather path (interpret mode on
CPU): forward values, all three gradients, zeros padding."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endoscopydepthestimation_pytorch_tpu.ops import warp_pallas
from endoscopydepthestimation_pytorch_tpu.ops.gridsample import grid_sample_nhwc


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(warp_pallas, "INTERPRET", True)


def _case(seed=0, b=2, h=16, w=24, c=2, hq=13, wq=24):
    rng = np.random.RandomState(seed)
    image = rng.randn(b, h, w, c).astype(np.float32)
    x = rng.uniform(-3, w + 3, (b, hq, wq)).astype(np.float32)
    y = rng.uniform(-3, h + 3, (b, hq, wq)).astype(np.float32)
    return jnp.asarray(image), jnp.asarray(x), jnp.asarray(y)


def test_pallas_forward_matches_gather():
    image, x, y = _case()
    ours = np.asarray(warp_pallas.grid_sample_pallas(image, x, y))
    golden = np.asarray(grid_sample_nhwc(image, x, y))
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)


def test_pallas_forward_single_channel_and_row_padding():
    image, x, y = _case(seed=1, c=1, hq=7)  # hq=7 exercises block padding
    ours = np.asarray(warp_pallas.grid_sample_pallas(image, x, y))
    golden = np.asarray(grid_sample_nhwc(image, x, y))
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)


def _grad_pair(image, x, y):
    def loss_pallas(im, xx, yy):
        return jnp.sum(jnp.sin(warp_pallas.grid_sample_pallas(im, xx, yy)))

    def loss_gather(im, xx, yy):
        return jnp.sum(jnp.sin(grid_sample_nhwc(im, xx, yy)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(image, x, y)
    gg = jax.grad(loss_gather, argnums=(0, 1, 2))(image, x, y)
    return gp, gg


def test_pallas_gradients_match_gather(monkeypatch):
    """Formulation exactness: with f32 backward matmuls the kernel matches
    the gather-path gradients to fp32 tolerance."""
    monkeypatch.setattr(warp_pallas, "BWD_DTYPE", jnp.float32)
    image, x, y = _case(seed=2, b=1, h=12, w=16, hq=12, wq=16)
    gp, gg = _grad_pair(image, x, y)
    for a, b in zip(gp, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_gradients_bf16_mode_tolerance(monkeypatch):
    """BWD_DTYPE=bfloat16 keeps the backward within bf16 tolerance of the
    gather gradients. Measured on v5e this mode is NOT faster (the kernel
    is VPU-bound on one-hot construction, see warp_pallas.BWD_DTYPE note),
    so f32 ships as the default; the mode stays covered."""
    monkeypatch.setattr(warp_pallas, "BWD_DTYPE", jnp.bfloat16)
    image, x, y = _case(seed=3, b=1, h=12, w=16, hq=12, wq=16)
    gp, gg = _grad_pair(image, x, y)
    for a, b in zip(gp, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)


def test_grad_first_variant_matches_when_tail_cotangent_zero():
    """sample_bilinear_pallas_grad_first: identical forward; gradients
    equal the full VJP whenever the non-first channels' cotangents are
    zero (the warp_depth mask-threshold pattern, geometry.py)."""
    image, x, y = _case(seed=5, b=1, h=12, w=16, hq=12, wq=16)  # c=2

    def loss(sample_fn, im, xx, yy):
        out = sample_fn(im, xx, yy)
        # channel 1 feeds a non-differentiable consumer only
        return (jnp.sum(jnp.sin(out[..., :1]))
                + jnp.sum((out[..., 1:] > 0.5).astype(jnp.float32)))

    px, py = x - 0.5, y - 0.5
    g_full = jax.grad(partial(loss, warp_pallas.sample_bilinear_pallas),
                      argnums=(0, 1, 2))(image, px, py)
    g_one = jax.grad(partial(loss, warp_pallas.sample_bilinear_pallas_grad_first),
                     argnums=(0, 1, 2))(image, px, py)
    for a, b in zip(g_one, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_pallas_zeros_padding():
    image = jnp.ones((1, 8, 8, 1))
    far = jnp.full((1, 8, 8), 50.0)
    out = warp_pallas.grid_sample_pallas(image, far, far)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_block_row_calibration():
    """Regression-lock the VMEM-calibrated block sizes (PERF.md round 2):
    measured pass/OOM boundaries on v5e — changing these silently would
    either OOM the compile or slow the kernel."""
    assert warp_pallas._fwd_rows(256, 320, 320, 2) == 8
    assert warp_pallas._fwd_rows(512, 640, 640, 2) == 2
    assert warp_pallas._bwd_rows(256, 320, 320, 1) == 8   # fits (15.7M)
    assert warp_pallas._bwd_rows(256, 320, 320, 2) == 4   # r=8 OOMs (26.5M)
    assert warp_pallas._bwd_rows(512, 640, 640, 1) == 1   # r=2 OOMs (19.1M)
