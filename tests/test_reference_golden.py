"""Golden parity against the reference's OWN geometry layers.

tests/test_geometry.py checks our ops against torch oracles re-derived
from the published math; this file removes the last re-derivation risk by
running the actual `/root/reference/models.py` layers (DepthScalingLayer,
FlowfromDepthLayer, DepthWarpingLayer, models.py:339-554) on CPU through
two shims:

* ``torch.Tensor.cuda`` / ``torch.nn.Module.cuda`` -> identity (the
  reference hardcodes .cuda() on every constant, models.py:328-344 etc.)
* ``torch.solve(B, A)`` (removed in torch>=1.9) -> ``linalg.solve(A, B)``
  with the legacy argument order (used for the K-inverse, models.py:392).

The reference code itself is IMPORTED, not copied.
"""
import importlib.util
import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from endoscopydepthestimation_pytorch_tpu.ops import geometry

REFERENCE = "/root/reference/models.py"


@pytest.fixture(scope="module")
def ref_models():
    # shim .cuda() to CPU identity
    orig_tensor_cuda = torch.Tensor.cuda
    orig_module_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    # torch>=1.9 ships torch.solve only as a raising deprecation stub
    orig_solve = getattr(torch, "solve", None)
    torch.solve = lambda b, a: (torch.linalg.solve(a, b), None)
    try:
        spec = importlib.util.spec_from_file_location("reference_models",
                                                      REFERENCE)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["reference_models"] = mod
        spec.loader.exec_module(mod)
        yield mod
    finally:
        torch.Tensor.cuda = orig_tensor_cuda
        torch.nn.Module.cuda = orig_module_cuda
        if orig_solve is None:
            del torch.solve
        else:
            torch.solve = orig_solve
        sys.modules.pop("reference_models", None)


def _fixture_batch(rng, b=2, h=24, w=32):
    """Endoscopy-like depths, masks, poses, intrinsics (NCHW for torch)."""
    from endoscopydepthestimation_pytorch_tpu.data.readers import quaternion_matrix
    depth1 = (rng.rand(b, 1, h, w).astype(np.float32) * 2.0 + 0.5)
    depth2 = (rng.rand(b, 1, h, w).astype(np.float32) * 2.0 + 0.5)
    masks = np.zeros((b, 1, h, w), np.float32)
    masks[:, :, 2:-2, 3:-3] = 1.0
    axis = rng.randn(b, 3)
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(-0.15, 0.15, (b, 1))
    rotations = np.stack([quaternion_matrix(
        np.concatenate([[np.cos(a[0] / 2)], np.sin(a[0] / 2) * ax]))[:3, :3]
        for a, ax in zip(angle, axis)]).astype(np.float32)
    translations = rng.uniform(-0.05, 0.05, (b, 3, 1)).astype(np.float32)
    k = np.zeros((b, 3, 3), np.float32)
    k[:, 0, 0] = rng.uniform(18, 24, b)
    k[:, 1, 1] = rng.uniform(18, 24, b)
    k[:, 0, 2] = w / 2 + rng.uniform(-2, 2, b)
    k[:, 1, 2] = h / 2 + rng.uniform(-2, 2, b)
    k[:, 2, 2] = 1.0
    return depth1, depth2, masks, rotations, translations, k


def _nhwc(x_nchw):
    return jnp.asarray(x_nchw.transpose(0, 2, 3, 1))


def test_depth_scaling_layer_golden(ref_models):
    rng = np.random.RandomState(11)
    b, h, w = 3, 24, 32
    pred = rng.rand(b, 1, h, w).astype(np.float32) * 3 + 0.1
    sparse = np.zeros((b, 1, h, w), np.float32)
    weights = np.zeros((b, 1, h, w), np.float32)
    idx = rng.rand(b, 1, h, w) < 0.07
    sparse[idx] = (rng.rand(int(idx.sum())) * 2 + 0.5).astype(np.float32)
    weights[idx] = rng.rand(int(idx.sum())).astype(np.float32) + 0.1

    layer = ref_models.DepthScalingLayer(epsilon=1.0e-8)
    with torch.no_grad():
        ref_scaled, ref_std = layer(
            [torch.from_numpy(pred), torch.from_numpy(sparse),
             torch.from_numpy(weights)])

    got_scaled, got_std = geometry.scale_recovery(
        _nhwc(pred), _nhwc(sparse), _nhwc(weights), 1.0e-8)
    np.testing.assert_allclose(np.asarray(got_scaled),
                               ref_scaled.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-5)
    assert float(got_std) == pytest.approx(float(ref_std), rel=1e-4)


def test_flow_from_depth_layer_golden(ref_models):
    rng = np.random.RandomState(12)
    depth1, _, masks, rot, trans, k = _fixture_batch(rng)
    layer = ref_models.FlowfromDepthLayer()
    with torch.no_grad():
        ref_flow = layer([torch.from_numpy(depth1), torch.from_numpy(masks),
                          torch.from_numpy(trans), torch.from_numpy(rot),
                          torch.from_numpy(k)])
    got = geometry.flow_from_depth(_nhwc(depth1), _nhwc(masks),
                                   jnp.asarray(trans), jnp.asarray(rot),
                                   jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(got),
                               ref_flow.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_depth_warping_layer_golden(ref_models):
    rng = np.random.RandomState(13)
    depth1, depth2, masks, rot, trans, k = _fixture_batch(rng)
    layer = ref_models.DepthWarpingLayer(epsilon=1.0e-8)
    with torch.no_grad():
        ref_warped, ref_mask = layer(
            [torch.from_numpy(depth1), torch.from_numpy(depth2),
             torch.from_numpy(masks), torch.from_numpy(trans),
             torch.from_numpy(rot), torch.from_numpy(k)])
    got_warped, got_mask = geometry.warp_depth(
        _nhwc(depth1), _nhwc(depth2), _nhwc(masks), jnp.asarray(trans),
        jnp.asarray(rot), jnp.asarray(k), 1.0e-8)
    got_warped = np.asarray(got_warped * got_mask)
    ref = (ref_warped * ref_mask).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got_warped, ref, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_mask),
                               ref_mask.numpy().transpose(0, 2, 3, 1),
                               rtol=0, atol=0)


def test_images_warping_golden(ref_models):
    """The reference's raw bilinear sampler (models.py:317-336) against our
    grid_sample on in/out-of-bounds coordinates."""
    from endoscopydepthestimation_pytorch_tpu.ops.gridsample import grid_sample_nhwc
    rng = np.random.RandomState(14)
    b, h, w = 2, 20, 28
    img = rng.randn(b, 3, h, w).astype(np.float32)
    u = rng.uniform(-3, w + 3, (b, h, w)).astype(np.float32)
    v = rng.uniform(-3, h + 3, (b, h, w)).astype(np.float32)
    with torch.no_grad():
        ref = ref_models.images_warping(
            torch.from_numpy(img), torch.from_numpy(u), torch.from_numpy(v))
    got = grid_sample_nhwc(jnp.asarray(img.transpose(0, 2, 3, 1)),
                           jnp.asarray(u), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-5)
