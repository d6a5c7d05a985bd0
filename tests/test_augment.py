"""Augmentation parameter-distribution tests.

albumentations itself is not installed in this image, so instead of a
golden A/B these tests pin our native pipeline to albumentations'
DOCUMENTED parameter semantics for the reference's exact configuration
(reference train.py:121-142): per-op formulas, parameter ranges
(inclusive bounds), the 180-range hue channel with mod wrap, and the
OneOf/Compose application probabilities (statistically).
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from endoscopydepthestimation_pytorch_tpu.data import augment


def _img(rng, h=32, w=40):
    return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)


def test_brightness_contrast_formula():
    """albu RandomBrightnessContrast(brightness_by_max=True):
    out = clip(img*alpha + beta*255) with alpha in 1+-0.3, beta in +-0.3."""
    rng = np.random.RandomState(0)
    img = _img(rng)
    state = np.random.RandomState(7)
    alpha = 1.0 + np.random.RandomState(7).uniform(-0.3, 0.3)
    beta = np.random.RandomState(7).uniform(-0.3, 0.3, 2)[1]
    out = augment._brightness_contrast(img, np.random.RandomState(7))
    expect = np.clip(img.astype(np.float32) * alpha + beta * 255.0,
                     0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out, expect)


def test_gamma_lut_formula():
    """albu RandomGamma(gamma_limit=(80,120)): LUT ((i/255)^g)*255,
    g = randint(80,120)/100 (integer gamma, like albumentations)."""
    rng = np.random.RandomState(1)
    img = _img(rng)
    g = int(np.random.RandomState(3).randint(80, 121)) / 100.0
    out = augment._gamma(img, np.random.RandomState(3))
    expect = np.clip(((np.arange(256) / 255.0) ** g) * 255.0,
                     0, 255).astype(np.uint8)[img]
    np.testing.assert_array_equal(out, expect)


def test_hue_shift_uses_180_range_with_wrap():
    """albu HueSaturationValue shifts cv2's 0-179 hue channel mod 180. A
    pure-hue rotation must preserve value (max RGB channel) exactly."""
    rng = np.random.RandomState(2)
    img = _img(rng)
    out = augment._hsv_shift(img, np.random.RandomState(5), 30, 0, 0)
    # value channel (max of RGB) invariant under pure hue rotation
    np.testing.assert_array_equal(out.max(axis=2), img.max(axis=2))
    # hue actually rotated for saturated pixels
    assert (out != img).any()
    # shift magnitude: compare hue channels mod 180
    h_in = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)[..., 0].astype(np.int32)
    h_out = cv2.cvtColor(out, cv2.COLOR_RGB2HSV)[..., 0].astype(np.int32)
    sat = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)[..., 1] > 40
    diff = np.mod(h_out - h_in, 180)[sat]
    diff = np.minimum(diff, 180 - diff)
    # one global shift |d| <= 30 (+-1 for uint8 round-trips)
    assert np.percentile(diff, 90) <= 31


def test_jpeg_quality_bounds_inclusive():
    """albu JpegCompression(quality_lower=20, quality_upper=100): integer
    quality, BOTH bounds reachable."""
    qualities = []
    orig = cv2.imencode

    def spy(ext, im, params):
        qualities.append(params[1])
        return orig(ext, im, params)

    rng = np.random.RandomState(4)
    img = _img(rng)
    cv2.imencode = spy
    try:
        draw = np.random.RandomState(6)
        for _ in range(500):
            augment._jpeg(img, draw)
    finally:
        cv2.imencode = orig
    assert min(qualities) == 20
    assert max(qualities) == 100
    # roughly uniform: mean near 60
    assert 55 < np.mean(qualities) < 65


def test_gauss_noise_sigma_range():
    """albu GaussNoise(var_limit=(10,30)): sigma = sqrt(uniform(10,30)).
    Measured output std must sit in [sqrt(10), sqrt(30)] (clipping slack)."""
    rng = np.random.RandomState(8)
    img = np.full((64, 64, 3), 128, np.uint8)
    stds = []
    draw = np.random.RandomState(9)
    for _ in range(50):
        out = augment._gauss_noise(img, draw)
        stds.append(float((out.astype(np.float32) - 128).std()))
    assert np.sqrt(10) - 0.5 < min(stds)
    assert max(stds) < np.sqrt(30) + 0.5


def test_block_application_probabilities():
    """Each OneOf block fires with p=0.5 (albumentations' OneOf default);
    member choice within a block is uniform."""
    rng = np.random.RandomState(10)
    img = _img(rng)
    draw = np.random.RandomState(11)
    n = 3000
    changed = 0
    for _ in range(n):
        # isolate block 2 statistics via the dispatch table by spying on
        # the rng stream shape: run the full pipeline and count identity
        out = augment.TrainingAugmentation(seed=int(draw.randint(1 << 30)))(img)
        if not np.array_equal(out, img):
            changed += 1
    # P(at least one of 3 blocks fires) = 1 - 0.5^3 = 0.875
    assert abs(changed / n - 0.875) < 0.03


def test_normalize_color_matches_reference():
    """albu.Normalize(mean=std=0.5, max_pixel_value=255):
    (x/255 - 0.5)/0.5."""
    x = np.array([[[0, 128, 255]]], np.uint8)
    out = augment.normalize_color(x)
    np.testing.assert_allclose(out[0, 0], [-1.0, 128 / 255 * 2 - 1, 1.0],
                               atol=1e-6)
