"""L0 reader parity against the bag_1 fixture and the reference-generated
precompute pickle (golden values)."""
import numpy as np
import pytest

from endoscopydepthestimation_pytorch_tpu.data import readers
from endoscopydepthestimation_pytorch_tpu.utils import plyio


def test_read_selected_indexes(fixture_seq):
    stride, selected = readers.read_selected_indexes(fixture_seq)
    assert stride == selected[1] - selected[0]
    assert selected[0] == 4584
    assert all(b > a for a, b in zip(selected, selected[1:]))


def test_read_visible_view_indexes(fixture_seq):
    visible = readers.read_visible_view_indexes(fixture_seq)
    assert len(visible) == 35
    assert visible[:5] == [4584, 4585, 4586, 4587, 4588]


def test_read_camera_intrinsics(fixture_seq):
    mats = readers.read_camera_intrinsic_per_view(fixture_seq)
    k = mats[0]
    assert k.shape == (3, 4)
    assert k[0, 0] == pytest.approx(677.171)
    assert k[1, 1] == pytest.approx(677.171)
    assert k[0, 2] == pytest.approx(872.127)
    assert k[1, 2] == pytest.approx(471.918)
    assert k[2, 2] == 1.0


def test_modify_intrinsics_matches_reference_pickle(fixture_seq, reference_precompute):
    mats = readers.read_camera_intrinsic_per_view(fixture_seq)
    modified = readers.modify_camera_intrinsic_matrix(mats[0], start_h=11, start_w=88,
                                                      downsampling_factor=4.0)
    golden = np.asarray(list(reference_precompute["intrinsic"].values())[0])
    np.testing.assert_allclose(modified, golden, rtol=1e-6)


def test_read_point_cloud(fixture_seq, reference_precompute):
    pts = plyio.read_point_cloud(fixture_seq / "structure.ply")
    assert pts.shape == (570, 4)
    assert np.all(pts[:, 3] == 1.0)
    golden = np.asarray(list(reference_precompute["point_cloud"].values())[0],
                        dtype=np.float32)
    np.testing.assert_allclose(pts, golden, rtol=1e-6)


def test_read_view_indexes_per_point(fixture_seq):
    visible = readers.read_visible_view_indexes(fixture_seq)
    vipp = readers.read_view_indexes_per_point(fixture_seq, visible, 570)
    assert vipp.shape == (570, 35)
    assert set(np.unique(vipp)) <= {0.0, 1.0}
    assert vipp.sum() > 0


def test_quaternion_matrix_identity_and_convention():
    np.testing.assert_allclose(readers.quaternion_matrix([1, 0, 0, 0]), np.identity(4))
    np.testing.assert_allclose(readers.quaternion_matrix([0, 1, 0, 0]),
                               np.diag([1.0, -1.0, -1.0, 1.0]))
    # scale invariance
    np.testing.assert_allclose(readers.quaternion_matrix([2, 0, 0, 0]), np.identity(4))
    # near-zero norm fallback
    np.testing.assert_allclose(readers.quaternion_matrix([1e-12, 0, 0, 0]), np.identity(4))
    # rotation matrices are orthonormal
    m = readers.quaternion_matrix([0.9, 0.1, -0.2, 0.3])
    r = m[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.identity(3), atol=1e-12)


def test_extrinsics_match_reference_pickle(fixture_seq, reference_precompute):
    poses = readers.read_pose_data(fixture_seq)
    golden_k = np.asarray(list(reference_precompute["intrinsic"].values())[0])
    extrinsics, projections = readers.get_extrinsic_matrix_and_projection_matrix(
        poses, intrinsic_matrix=golden_k, visible_view_count=35)
    golden_ext = [np.asarray(e) for e in list(reference_precompute["extrinsics"].values())[0]]
    golden_proj = [np.asarray(p) for p in list(reference_precompute["projections"].values())[0]]
    assert len(extrinsics) == len(golden_ext) == 35
    for ours, ref in zip(extrinsics, golden_ext):
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)
    for ours, ref in zip(projections, golden_proj):
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_filename_discovery(fixture_root, fixture_seq):
    train, val, test = readers.get_color_file_names_by_bag(fixture_root, 1, 1, 1)
    assert len(train) == 35 and len(val) == 35 and len(test) == 35
    folders = readers.get_parent_folder_names(fixture_root, (1, 2))
    assert folders == [fixture_seq]
    files = readers.get_filenames_from_frame_indexes(fixture_seq, [4584, 4618, 99999])
    assert len(files) == 2


def test_ply_roundtrip(tmp_path):
    pc = np.concatenate([np.random.RandomState(0).randn(10, 3).astype(np.float32),
                         np.random.RandomState(1).randint(0, 255, (10, 3))], axis=1)
    plyio.write_point_cloud(tmp_path / "out.ply", pc)
    v = plyio.read_ply_vertices(tmp_path / "out.ply")
    np.testing.assert_allclose(v["x"], pc[:, 0].astype(np.float32), rtol=1e-6)
    np.testing.assert_array_equal(v["red"], pc[:, 3].astype(np.uint8))


def test_quaternion_doctests():
    """The reference keeps doctests on quaternion_matrix (utils.py:1361-1369)
    but never runs them; we do."""
    import doctest
    from endoscopydepthestimation_pytorch_tpu.data import readers as mod
    results = doctest.testmod(mod, verbose=False)
    assert results.attempted >= 2
    assert results.failed == 0
