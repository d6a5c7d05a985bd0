"""Streaming depth predictor: ordered output, batch padding on the ragged
tail, agreement with direct prediction."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endoscopydepthestimation_pytorch_tpu import serving, training
from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57
from endoscopydepthestimation_pytorch_tpu.utils import checkpoint as ckpt


@pytest.fixture(scope="module")
def predictor(fixture_seq, fixture_sequence_data, tmp_path_factory):
    model = FCDenseNet57(n_classes=1)
    config = training.TrainConfig()
    state = training.create_train_state(model, jax.random.PRNGKey(3),
                                        (1, 256, 320, 3), config)
    path = tmp_path_factory.mktemp("serve_ckpt") / "ckpt"
    ckpt.save_checkpoint(path, state, epoch=1, validation_loss=0.5)
    return serving.DepthPredictor(path, fixture_sequence_data, batch_size=2,
                                  dtype=jnp.float32, packed=False)


def test_predict_frame(predictor, fixture_seq):
    depth = predictor.predict_frame(fixture_seq / "00004584.jpg")
    assert depth.shape == (256, 320)
    assert np.isfinite(depth).all() and (depth >= 0).all()
    boundary = (np.asarray(predictor.sequence.mask_boundary, np.float32) / 255.0
                > 0.9)
    assert depth[~boundary].max() == 0.0  # masked outside the boundary


def test_stream_ordered_and_consistent(predictor, fixture_seq):
    frames = [fixture_seq / f"{i:08d}.jpg" for i in (4584, 4585, 4586, 4587, 4588)]
    results = list(predictor.stream(frames))
    assert [i for i, _ in results] == [0, 1, 2, 3, 4]  # ragged tail included
    direct = predictor.predict_frame(frames[2])
    np.testing.assert_allclose(results[2][1], direct, rtol=1e-5, atol=1e-6)


def test_pjrt_bundle_export(predictor, tmp_path):
    """The native-host bundle carries a valid single-platform StableHLO
    artifact plus the specs the C++ host parses. Execution against a real
    plugin is hardware-gated (scripts/serve_pjrt_e2e.py)."""
    bundle = tmp_path / "bundle"
    predictor.export_pjrt_bundle(bundle, platform="cpu")

    module = (bundle / "module.mlirbc").read_bytes()
    assert module[:4] == b"ML\xefR"  # MLIR bytecode magic
    assert (bundle / "compile_options.pb").stat().st_size > 0

    meta = dict(line.split("=", 1) for line in
                (bundle / "meta.txt").read_text().splitlines())
    assert meta["platform"] == "cpu"
    assert meta["input0_shape"] == "2,256,320,3"
    assert meta["input0_dtype"] == "float32"
    assert meta["output0_shape"] == "2,256,320,1"
    assert meta["output0_dtype"] == "float32"  # host never sees bf16

    binary = serving.build_pjrt_host()
    import json
    import subprocess
    out = subprocess.run([str(binary), "--help"], capture_output=True,
                         text=True, timeout=60)
    assert out.returncode == 0 and "--bundle" in out.stdout

    # the host's own bundle-contract check (no plugin needed)
    out = subprocess.run([str(binary), "--parse-only", "--bundle",
                          str(bundle)], capture_output=True, text=True,
                         timeout=60)
    assert out.returncode == 0, out.stderr
    parsed = json.loads(out.stdout)
    assert parsed["inputs"] == 1 and parsed["outputs"] == 1
    assert parsed["input0_bytes"] == 2 * 256 * 320 * 3 * 4
    assert parsed["output0_bytes"] == 2 * 256 * 320 * 1 * 4


def test_export_round_trip(predictor, fixture_seq, tmp_path):
    """AOT artifact (jax.export) reproduces the live predictor with no
    model code on the load side."""
    path = tmp_path / "depth_predictor.jaxexp"
    predictor.export(path)
    assert path.stat().st_size > 1000  # params baked in as constants

    fn = serving.load_exported(path)
    colors = np.stack([predictor.prepare(fixture_seq / f"{i:08d}.jpg")
                       for i in (4584, 4585)])
    exported_depth = np.asarray(fn(jnp.asarray(colors)))[..., 0]
    direct = predictor.predict_batch(colors)
    # the AOT artifact compiles through a different pipeline than live jit
    # (different fusion/rounding order), so allow ~1 ulp-of-fusion slack
    np.testing.assert_allclose(exported_depth, direct, rtol=1e-4, atol=1e-5)
