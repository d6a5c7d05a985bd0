"""Test harness configuration.

Must run before jax is imported anywhere: force the CPU platform with 8
virtual devices so multi-chip sharding paths are exercised without TPU
hardware (the driver separately compile-checks on real hardware).
"""
import os

# Force CPU with 8 virtual devices. NOTE: the axon environment pre-imports
# jax in sitecustomize and exports JAX_PLATFORMS=axon, so a plain env
# setdefault is NOT enough — override the env and the live jax config.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

FIXTURE_ROOT = pathlib.Path("/root/reference/example_training_data_root")
FIXTURE_SEQ = FIXTURE_ROOT / "bag_1" / "_start_004259_end_004629_stride_25_segment_13"
FIXTURE_PKL = FIXTURE_ROOT / "precompute_4.0_64_0.99.pkl"


@pytest.fixture(scope="session")
def fixture_seq():
    if not FIXTURE_SEQ.exists():
        pytest.skip("bag_1 fixture not available")
    return FIXTURE_SEQ


@pytest.fixture(scope="session")
def fixture_root():
    if not FIXTURE_ROOT.exists():
        pytest.skip("fixture root not available")
    return FIXTURE_ROOT


@pytest.fixture(scope="session")
def reference_precompute():
    """The 14-element precompute pickle produced by the reference itself —
    a golden artifact for preprocessing parity."""
    import pickle
    if not FIXTURE_PKL.exists():
        pytest.skip("reference precompute pickle not available")
    with open(FIXTURE_PKL, "rb") as f:
        data = pickle.load(f)
    keys = ("crop", "selected", "visible", "point_cloud", "intrinsic", "mask",
            "view_indexes_per_point", "extrinsics", "projections", "clean",
            "downsampling", "network_downsampling", "inlier_percentage", "scale")
    return dict(zip(keys, data))


@pytest.fixture(scope="session")
def fixture_sequence_data(fixture_seq):
    """Our own precompute over the fixture sequence (heavy: session-scoped)."""
    from endoscopydepthestimation_pytorch_tpu.data import preprocess
    return preprocess.preprocess_sequence(
        fixture_seq, downsampling=4.0, network_downsampling=64, is_hsv=False,
        inlier_percentage=0.99, visible_interval=30,
        suggested_h=256, suggested_w=320)


def assert_allclose(a, b, rtol=1e-5, atol=1e-6):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)
