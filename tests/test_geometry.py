"""Geometry-op parity against torch oracles (CPU).

The reference geometry layers hardcode .cuda() and cannot run here, so the
oracles re-express the same published math through torch's public API
(grid_sample, bmm) — an independent implementation path from our jnp code.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endoscopydepthestimation_pytorch_tpu.ops import geometry
from endoscopydepthestimation_pytorch_tpu.ops.gridsample import grid_sample_nhwc

torch = pytest.importorskip("torch")


def _rand_pose(rng, batch):
    """Random small rotation + translation, plus endoscopy-like intrinsics."""
    axis = rng.randn(batch, 3)
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(-0.2, 0.2, (batch, 1))
    from endoscopydepthestimation_pytorch_tpu.data.readers import quaternion_matrix
    rotations = np.stack([quaternion_matrix(
        np.concatenate([[np.cos(a[0] / 2)], np.sin(a[0] / 2) * ax]))[:3, :3]
        for a, ax in zip(angle, axis)]).astype(np.float32)
    translations = rng.uniform(-0.05, 0.05, (batch, 3, 1)).astype(np.float32)
    k = np.zeros((batch, 3, 3), np.float32)
    k[:, 0, 0] = rng.uniform(150, 200, batch)
    k[:, 1, 1] = rng.uniform(150, 200, batch)
    k[:, 0, 2] = rng.uniform(120, 140, batch)
    k[:, 1, 2] = rng.uniform(100, 110, batch)
    k[:, 2, 2] = 1.0
    return rotations, translations, k


def _torch_grid_sample(image_nhwc, x, y, align_corners=False):
    """Torch oracle for the reference's normalization (models.py:325-336):
    grid = 2*(coord/size) - 1, bilinear, zeros padding."""
    im = torch.from_numpy(image_nhwc.transpose(0, 3, 1, 2))
    b, c, h, w = im.shape
    gx = 2.0 * torch.from_numpy(x) / w - 1.0
    gy = 2.0 * torch.from_numpy(y) / h - 1.0
    grid = torch.stack([gx, gy], dim=-1)
    out = torch.nn.functional.grid_sample(im, grid, mode="bilinear",
                                          padding_mode="zeros",
                                          align_corners=align_corners)
    return out.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(align_corners):
    rng = np.random.RandomState(0)
    image = rng.randn(2, 24, 32, 3).astype(np.float32)
    # sample coordinates spanning in-bounds, boundary, and out-of-bounds
    x = rng.uniform(-4, 36, (2, 24, 32)).astype(np.float32)
    y = rng.uniform(-4, 28, (2, 24, 32)).astype(np.float32)
    ours = np.asarray(grid_sample_nhwc(jnp.asarray(image), jnp.asarray(x),
                                       jnp.asarray(y), align_corners=align_corners))
    oracle = _torch_grid_sample(image, x, y, align_corners=align_corners)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)


def test_grid_sample_gradients_flow():
    image = jnp.ones((1, 8, 8, 1))
    x = jnp.full((1, 8, 8), 3.3)
    y = jnp.full((1, 8, 8), 4.7)
    g = jax.grad(lambda im: grid_sample_nhwc(im, x, y).sum())(image)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_intrinsics_inverse_closed_form():
    rng = np.random.RandomState(1)
    _, _, k = _rand_pose(rng, 4)
    inv = np.asarray(geometry.intrinsics_inverse(jnp.asarray(k)))
    for i in range(4):
        np.testing.assert_allclose(inv[i] @ k[i], np.eye(3), atol=1e-5)


def _oracle_warp_terms(rotations, translations, k):
    """W = K R^T (-t), M = K R^T K^-1 via torch bmm (models.py:391-399)."""
    kt = torch.from_numpy(k)
    rt = torch.from_numpy(rotations).transpose(1, 2)
    tt = torch.from_numpy(translations)
    k_inv = torch.linalg.inv(kt)
    temp = torch.bmm(kt, rt)
    w_vec = torch.bmm(temp, -tt)
    m = torch.bmm(temp, k_inv)
    return w_vec.numpy(), m.numpy()


def test_flow_from_depth_matches_oracle():
    rng = np.random.RandomState(2)
    b, h, w = 2, 24, 32
    rotations, translations, k = _rand_pose(rng, b)
    depth = rng.uniform(0.5, 2.0, (b, h, w, 1)).astype(np.float32)
    mask = (rng.uniform(0, 1, (b, h, w, 1)) > 0.2).astype(np.float32)

    flow = np.asarray(geometry.flow_from_depth(
        jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(translations),
        jnp.asarray(rotations), jnp.asarray(k)))

    # oracle: per-pixel reprojection in float64 numpy
    w_vec, m = _oracle_warp_terms(rotations, translations, k)
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    for bi in range(b):
        pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1)  # (h, w, 3)
        mp = pix @ m[bi].T
        z2 = w_vec[bi, 2, 0] + depth[bi, :, :, 0] * mp[..., 2]
        z2 = np.where(mask[bi, :, :, 0] > 0.5, z2, 1e30)
        u2 = (w_vec[bi, 0, 0] + depth[bi, :, :, 0] * mp[..., 0]) / z2
        v2 = (w_vec[bi, 1, 0] + depth[bi, :, :, 0] * mp[..., 1]) / z2
        np.testing.assert_allclose(flow[bi, :, :, 0], (u2 - xs) / w, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(flow[bi, :, :, 1], (v2 - ys) / h, rtol=1e-4, atol=1e-6)


def test_warp_depth_identity_pose():
    """With identity rotation and zero translation the warped depth must be
    (approximately) the other frame's depth inside the mask interior."""
    b, h, w = 1, 16, 16
    depth1 = jnp.ones((b, h, w, 1)) * 1.5
    depth2 = jnp.ones((b, h, w, 1)) * 2.5
    mask = jnp.ones((b, h, w, 1))
    rot = jnp.eye(3)[None]
    trans = jnp.zeros((b, 3, 1))
    k = jnp.asarray(np.array([[[100.0, 0, 8], [0, 100.0, 8], [0, 0, 1]]], np.float32))
    warped, intersect = geometry.warp_depth(depth1, depth2, mask, trans, rot, k)
    warped = np.asarray(warped)
    intersect = np.asarray(intersect)
    # identity pose: u2 == u, v2 == v; half-pixel sampling shift averages
    # equal neighbors so the interior is exact
    np.testing.assert_allclose(warped[0, 2:-2, 2:-2, 0], 2.5, rtol=1e-5)
    assert intersect[0, 2:-2, 2:-2, 0].min() == 1.0


def test_warp_depth_epsilon_guards():
    """Pixels behind the camera or outside the mask must not produce NaNs."""
    rng = np.random.RandomState(3)
    b, h, w = 2, 16, 16
    rotations, translations, k = _rand_pose(rng, b)
    k[:, 0, 2] = 8.0
    k[:, 1, 2] = 8.0
    depth1 = rng.uniform(-0.5, 1.0, (b, h, w, 1)).astype(np.float32)  # some negative
    depth2 = rng.uniform(0.5, 2.0, (b, h, w, 1)).astype(np.float32)
    mask = (rng.uniform(0, 1, (b, h, w, 1)) > 0.5).astype(np.float32)
    warped, intersect = geometry.warp_depth(
        jnp.asarray(depth1), jnp.asarray(depth2), jnp.asarray(mask),
        jnp.asarray(translations), jnp.asarray(rotations), jnp.asarray(k))
    assert np.isfinite(np.asarray(warped)).all()
    assert set(np.unique(np.asarray(intersect))) <= {0.0, 1.0}


def test_scale_recovery_exact_ratio():
    """If sparse depth = s * predicted on the sampled pixels, the recovered
    scale is exactly s and the normalized std is ~0."""
    rng = np.random.RandomState(4)
    b, h, w = 2, 16, 16
    predicted = rng.uniform(0.5, 1.5, (b, h, w, 1)).astype(np.float32)
    mask = np.zeros((b, h, w, 1), np.float32)
    mask[:, ::3, ::3] = 1.0
    s = np.array([2.0, 0.5], np.float32).reshape(b, 1, 1, 1)
    sparse = predicted * s * mask
    scaled, nstd = geometry.scale_recovery(jnp.asarray(predicted), jnp.asarray(sparse),
                                           jnp.asarray(mask), epsilon=0.0)
    # kept pixels are those with sparse > 0.5*mean(sparse over mask);
    # ratio is constant so scale == s regardless of which are kept
    np.testing.assert_allclose(np.asarray(scaled), predicted * s, rtol=1e-4)
    assert float(nstd) < 1e-3


def test_scale_recovery_matches_formula():
    """Golden re-derivation of DepthScalingLayer (models.py:339-363)."""
    rng = np.random.RandomState(5)
    b, h, w = 2, 12, 12
    predicted = rng.uniform(0.1, 2.0, (b, h, w, 1)).astype(np.float32)
    sparse = rng.uniform(0.0, 3.0, (b, h, w, 1)).astype(np.float32)
    wmask = (rng.uniform(0, 1, (b, h, w, 1)) > 0.6).astype(np.float32)
    sparse = sparse * wmask
    eps = 1e-8

    scaled, nstd = geometry.scale_recovery(jnp.asarray(predicted), jnp.asarray(sparse),
                                           jnp.asarray(wmask), epsilon=eps)
    # numpy golden
    binary = (wmask > 1e-8).astype(np.float32)
    mean_sparse = (sparse * binary).sum((1, 2, 3), keepdims=True) / binary.sum((1, 2, 3), keepdims=True)
    above = (sparse > 0.5 * mean_sparse).astype(np.float32)
    maps = sparse * above / (eps + predicted)
    scales = maps.sum((1, 2, 3)) / above.sum((1, 2, 3))
    np.testing.assert_allclose(np.asarray(scaled),
                               scales.reshape(b, 1, 1, 1) * predicted, rtol=1e-4)
    centered = maps - above * scales.reshape(b, 1, 1, 1)
    stds = np.sqrt((centered ** 2).sum((1, 2, 3)) / above.sum((1, 2, 3)))
    # the reference broadcasts (B,)/(B,1,1,1) -> (B,1,1,B) before the mean
    # (models.py:361-363): mean(std_i) * mean(1/scale_j), reproduced exactly
    np.testing.assert_allclose(float(nstd), stds.mean() * (1.0 / scales).mean(),
                               rtol=1e-4)


def test_warp_depth_cycle_consistency():
    """Warping a smooth depth field through pose P then sampling with the
    inverse pose should approximately recover it (interior, smooth field)."""
    rng = np.random.RandomState(6)
    b, h, w = 1, 32, 32
    rotations, translations, k = _rand_pose(rng, b)
    k[:, 0, 2] = 16.0
    k[:, 1, 2] = 16.0
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    depth = (1.5 + 0.1 * np.sin(xs / 7.0) + 0.1 * np.cos(ys / 9.0)).astype(np.float32)
    depth = depth[None, :, :, None]
    mask = np.ones((b, h, w, 1), np.float32)
    # consistent frame-2 depth implied by the pose itself
    w_vec, m = _oracle_warp_terms(rotations, translations, k)
    warped, intersect = geometry.warp_depth(
        jnp.asarray(depth), jnp.asarray(depth), jnp.asarray(mask),
        jnp.asarray(translations), jnp.asarray(rotations), jnp.asarray(k))
    inner = np.asarray(intersect)[0, 8:-8, 8:-8, 0] > 0.5
    w_in = np.asarray(warped)[0, 8:-8, 8:-8, 0][inner]
    d_in = depth[0, 8:-8, 8:-8, 0][inner]
    # small pose => warped depth close to original scale
    assert np.abs(w_in - d_in).mean() < 0.25


def test_mxu_grid_sample_matches_gather_path():
    """The one-hot-matmul sampler must agree with the gather sampler
    (and therefore with torch) everywhere, including OOB zeros padding."""
    from endoscopydepthestimation_pytorch_tpu.ops.gridsample import grid_sample_nhwc_mxu
    rng = np.random.RandomState(7)
    for c in (1, 2, 3):
        image = rng.randn(2, 24, 32, c).astype(np.float32)
        x = rng.uniform(-4, 36, (2, 24, 32)).astype(np.float32)
        y = rng.uniform(-4, 28, (2, 24, 32)).astype(np.float32)
        a = np.asarray(grid_sample_nhwc(jnp.asarray(image), jnp.asarray(x), jnp.asarray(y)))
        b = np.asarray(grid_sample_nhwc_mxu(jnp.asarray(image), jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_mxu_grid_sample_nonmultiple_rows_and_grads():
    from endoscopydepthestimation_pytorch_tpu.ops.gridsample import grid_sample_nhwc_mxu
    rng = np.random.RandomState(8)
    image = rng.randn(1, 13, 17, 1).astype(np.float32)
    x = rng.uniform(0, 16, (1, 13, 17)).astype(np.float32)
    y = rng.uniform(0, 12, (1, 13, 17)).astype(np.float32)
    a = np.asarray(grid_sample_nhwc(jnp.asarray(image), jnp.asarray(x), jnp.asarray(y)))
    b = np.asarray(grid_sample_nhwc_mxu(jnp.asarray(image), jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    # gradients agree between the two paths (image and coords)
    ga = jax.grad(lambda im, xx, yy: grid_sample_nhwc(im, xx, yy).sum(), argnums=(0, 1, 2))(
        jnp.asarray(image), jnp.asarray(x), jnp.asarray(y))
    gb = jax.grad(lambda im, xx, yy: grid_sample_nhwc_mxu(im, xx, yy).sum(), argnums=(0, 1, 2))(
        jnp.asarray(image), jnp.asarray(x), jnp.asarray(y))
    for u, v in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), rtol=1e-3, atol=1e-4)
