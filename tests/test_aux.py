"""Aux subsystem tests: distillation, failure detection, model selection,
EM-tracker sync, remaining readers, visualization extras."""
import numpy as np
import pytest

from endoscopydepthestimation_pytorch_tpu import failure
from endoscopydepthestimation_pytorch_tpu.data import readers, tracker
from endoscopydepthestimation_pytorch_tpu.utils import visualization as viz


# ---------------------------------------------------------------------------
# failure detection / model selection
# ---------------------------------------------------------------------------

def test_detect_outlier_batches():
    rng = np.random.RandomState(0)
    flows = rng.randn(4, 8, 8, 2).astype(np.float32)
    pred = flows.copy()
    pred[2] += 5.0  # one very wrong sample
    masks = np.ones((4, 8, 8, 1), np.float32)
    idx, per_sample = failure.detect_outlier_batches(flows, pred, masks,
                                                     failure_threshold=1.0)
    assert idx == [2]
    assert per_sample.shape == (4,)
    report = failure.worst_sample_report(per_sample, per_sample,
                                         ["a", "b", "c", "d"])
    assert report["worst_index_1"] == 2 and report["worst_folder_1"] == "c"


def test_outlier_robust_validation_loss_delta():
    prev = np.array([1.0, 1.0, 1.0, 1.0])
    # uniformly better -> negative
    assert failure.outlier_robust_validation_loss_delta(prev - 0.1, prev) < 0
    # uniformly worse -> positive
    assert failure.outlier_robust_validation_loss_delta(prev + 0.1, prev) > 0
    # one outlier improvement vs three small regressions: the robust
    # weighting multiplies each side by its count, favoring the majority
    new = np.array([0.2, 1.05, 1.05, 1.05])
    assert failure.outlier_robust_validation_loss_delta(new, prev) < 0  # 1*(-0.8)+3*(0.15)
    new2 = np.array([0.9, 1.2, 1.2, 1.2])
    assert failure.outlier_robust_validation_loss_delta(new2, prev) > 0
    # length conventions (reference utils.py:1741-1744)
    assert failure.outlier_robust_validation_loss_delta([1, 2], [1]) == -1.0
    assert failure.outlier_robust_validation_loss_delta([1], [1, 2]) == 1.0


def test_save_if_best(tmp_path):
    written = []
    failure.save_if_best(lambda p: written.append(str(p)), tmp_path,
                         tmp_path / "best", "0", [1.0, 1.0], [2.0, 2.0])
    assert any("best" in w for w in written)
    written.clear()
    best = failure.save_if_best(lambda p: written.append(str(p)), tmp_path,
                                tmp_path / "best", "1", [3.0, 3.0], [2.0, 2.0])
    assert not any(w.endswith("best") for w in written)
    np.testing.assert_array_equal(best, [2.0, 2.0])


# ---------------------------------------------------------------------------
# teacher-student distillation
# ---------------------------------------------------------------------------

def test_distill_step_converges_toward_teacher():
    import jax
    import jax.numpy as jnp
    from endoscopydepthestimation_pytorch_tpu import training
    from endoscopydepthestimation_pytorch_tpu.distill import make_jit_distill_step
    from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57

    config = training.TrainConfig(lr_step_size=50)
    model = FCDenseNet57(n_classes=1)
    teacher = training.create_train_state(model, jax.random.PRNGKey(0),
                                          (1, 32, 32, 3), config)
    student = training.create_train_state(model, jax.random.PRNGKey(1),
                                          (1, 32, 32, 3), config)
    rng = np.random.RandomState(0)
    batch = {
        "color_1": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)),
        "color_2": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)),
        "boundary": jnp.ones((2, 32, 32, 1), jnp.float32),
    }
    step_fn = make_jit_distill_step(config)
    losses_seen = []
    for _ in range(6):
        student, metrics = step_fn(student, teacher, batch)
        losses_seen.append(float(metrics["loss"]))
    assert all(np.isfinite(losses_seen))
    assert losses_seen[-1] < losses_seen[0]


# ---------------------------------------------------------------------------
# EM-tracker sync suite
# ---------------------------------------------------------------------------

@pytest.fixture()
def tracker_root(tmp_path):
    # pose stream: header + rows 'a,b,c,d,e,x,y,z,qx,qy,qz,qw'
    lines = ["header"]
    for i, frame in enumerate([10, 10, 14, 30]):
        lines.append(f"0,0,0,0,0,{i + 1}.0,0.0,0.0,0.0,0.0,0.0,1.0")
    (tmp_path / "poses").write_text("\n".join(lines) + "\n")
    (tmp_path / "pose_corresponding_image_indexes").write_text(
        "\n".join(f"{f}.0, 0.0" for f in [10, 10, 14, 30]) + "\n")
    import cv2
    img = np.zeros((8, 8, 3), np.uint8)
    for frame in [10, 12]:
        cv2.imwrite(str(tmp_path / f"{frame:08d}.jpg"), img)
    return tmp_path


def test_read_pose_messages_and_sync(tracker_root):
    t, r = tracker.read_pose_messages_from_tracker(tracker_root / "poses")
    assert len(t) == 4 and len(r) == 4
    np.testing.assert_allclose(r[0], np.eye(3))
    np.testing.assert_allclose(t[1], [2.0, 0.0, 0.0])

    tracker.synchronize_selected_calibration_poses(tracker_root)
    # frame 10 matched exactly (two poses averaged); frame 12 nearest (14)
    coords_10 = (tracker_root / "00000010.coords").read_text()
    assert coords_10.startswith("1.50000,")  # mean of translations 1.0, 2.0
    assert (tracker_root / "00000012.coords").exists()


def test_read_initial_pose_file(tmp_path):
    (tmp_path / "init").write_text("7, 1.0, 2.0, 3.0, 1.0, 0.0, 0.0, 0.0\n")
    frames, trans, rots = tracker.read_initial_pose_file(tmp_path / "init")
    assert frames == [7]
    np.testing.assert_allclose(trans["00000007"], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(rots["00000007"], np.diag([1.0, -1.0, -1.0]))


def test_camera_to_tcp_transform(tmp_path):
    values = " ".join(str(float(i)) for i in range(12))
    (tmp_path / "camera_to_tcp").write_text(values + "\n")
    r, t = tracker.read_camera_to_tcp_transform(tmp_path)
    np.testing.assert_allclose(r, [[0, 1, 2], [4, 5, 6], [8, 9, 10]])
    np.testing.assert_allclose(t[:, 0], [3, 7, 11])


def test_point_cloud_with_initial_pose_transforms_frame():
    depth = np.ones((4, 4), np.float32)
    depth[0, 0] = 2.0  # give the span a nonzero range
    color = np.full((4, 4, 3), 128, np.uint8)
    mask = np.ones((4, 4), np.float32)
    k = np.array([[10.0, 0, 2], [0, 10.0, 2], [0, 0, 1]])
    rotation = np.eye(3)
    translation = np.array([100.0, 0.0, 0.0])
    cloud = tracker.point_cloud_from_depth_and_initial_pose(
        depth, color, mask, k, translation, rotation, 1)
    assert cloud.shape == (16, 6)
    assert (cloud[:, 0] > 50).all()  # shifted into the tracker frame


def test_write_test_output_with_initial_pose(tmp_path):
    colors = np.zeros((1, 8, 8, 3), np.float32)
    depths = np.ones((1, 8, 8, 1), np.float32)
    depths[0, 0, 0, 0] = 2.0
    boundaries = np.ones((1, 8, 8, 1), np.float32)
    k = np.array([[[10.0, 0, 4], [0, 10.0, 4], [0, 0, 1]]])
    tracker.write_test_output_with_initial_pose(
        tmp_path, colors, depths, boundaries, k, is_hsv=False,
        image_indexes=["00000001"],
        translation_dict={"00000001": np.zeros(3)},
        rotation_dict={"00000001": np.eye(3)})
    assert (tmp_path / "test_point_cloud_00000001.ply").exists()
    assert (tmp_path / "test_color_00000001.jpg").exists()
    assert (tmp_path / "test_depth_00000001.jpg").exists()


# ---------------------------------------------------------------------------
# remaining readers + visualization extras
# ---------------------------------------------------------------------------

def test_split_ratio_file_names(fixture_root):
    train, val, test = readers.get_color_file_names(fixture_root,
                                                    split_ratio=(0.8, 0.1, 0.1))
    assert len(train) == 28 and len(val) == 3 and len(test) == 4


def test_read_visible_image_path_list(fixture_root):
    indexes = readers.read_visible_image_path_list(fixture_root)
    assert len(indexes) == 35 and indexes[0] == 4584


def test_get_visible_count_per_point(fixture_sequence_data):
    counts = readers.get_visible_count_per_point(
        fixture_sequence_data.view_indexes_per_point)
    assert counts.shape == (570, 1)
    assert counts.min() >= 0 and counts.max() <= 35 * 60


def test_flow_color_wheel():
    wheel = viz.flow_color_wheel(101)
    assert wheel.shape == (101, 101, 3) and wheel.dtype == np.uint8
    center = wheel[50, 50]
    assert int(center.max()) <= 5  # zero magnitude -> black center


def test_write_depth_outputs(tmp_path):
    colors = np.zeros((2, 8, 8, 3), np.float32)
    depths = np.abs(np.random.RandomState(0).randn(2, 8, 8, 1)).astype(np.float32)
    boundaries = np.ones((2, 8, 8, 1), np.float32)
    k = np.tile(np.array([[10.0, 0, 4], [0, 10.0, 4], [0, 0, 1]], np.float32), (2, 1, 1))
    viz.write_depth_outputs(tmp_path, colors, depths, boundaries, k, prefix="t_")
    assert (tmp_path / "t_color_0.jpg").exists()
    assert (tmp_path / "t_depth_1.jpg").exists()
    assert (tmp_path / "t_point_cloud_0.ply").exists()


def test_weight_histograms_smoke(tmp_path):
    import jax
    import jax.numpy as jnp
    params = {"layer": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros(3)}}
    writer = viz.MetricWriter(tmp_path)
    viz.weight_histograms(params, writer, step=0)
    writer.close()


def test_network_validation_feeds_robust_selection(tmp_path):
    """The standalone validation routine (reference utils.py:1615-1731)
    returns (mean, per-batch vector); the vector drives save_if_best
    end-to-end."""
    import jax
    import jax.numpy as jnp

    from endoscopydepthestimation_pytorch_tpu import training, validation
    from endoscopydepthestimation_pytorch_tpu import failure
    from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57
    from tests.test_training import _synthetic_batch

    config = training.TrainConfig(lr_step_size=10)
    model = FCDenseNet57(n_classes=1)
    state = training.create_train_state(model, jax.random.PRNGKey(0),
                                        (1, 32, 32, 3), config)
    batches = [_synthetic_batch(seed=s, batch=2, h=32, w=32)
               for s in range(3)]

    mean, vector = validation.network_validation(state, batches,
                                                 sfl_weight=20.0,
                                                 dcl_weight=5.0)
    assert len(vector) == 3
    assert np.isfinite(mean)
    assert mean == pytest.approx(np.mean(vector))

    saved = []
    best = failure.save_if_best(lambda p: saved.append(str(p)), tmp_path,
                                tmp_path / "best", "0",
                                vector, [v + 1.0 for v in vector])
    assert list(best) == vector           # better -> adopted
    assert any(s.endswith("best") for s in saved)


def test_write_event_round_trip(tmp_path):
    """Repaired reference write_event (utils.py:817-822): JSON event lines
    with step + ISO timestamp, sorted keys, flushed per call."""
    import json

    from endoscopydepthestimation_pytorch_tpu.utils.visualization import write_event

    p = tmp_path / "events.log"
    with open(p, "w") as log:
        write_event(log, 1, loss=0.5)
        write_event(log, 2, loss=0.25, phase="val")
    lines = p.read_text().strip().splitlines()
    assert len(lines) == 2
    recs = [json.loads(ln) for ln in lines]
    assert recs[0]["step"] == 1 and recs[0]["loss"] == 0.5
    assert recs[1]["phase"] == "val" and "dt" in recs[1]
    assert list(recs[0]) == sorted(recs[0])
