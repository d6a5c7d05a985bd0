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
