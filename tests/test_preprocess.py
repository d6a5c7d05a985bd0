"""L1 preprocessing parity against the reference-generated precompute pickle."""
import numpy as np
import pytest

from endoscopydepthestimation_pytorch_tpu.data import preprocess


def test_crop_positions_and_mask(fixture_sequence_data, reference_precompute):
    golden_crop = [int(v) for v in list(reference_precompute["crop"].values())[0]]
    assert fixture_sequence_data.crop_positions == golden_crop  # [11, 267, 88, 408]
    golden_mask = np.asarray(list(reference_precompute["mask"].values())[0])
    assert fixture_sequence_data.mask_boundary.shape == golden_mask.shape == (256, 320)
    np.testing.assert_array_equal(fixture_sequence_data.mask_boundary, golden_mask)


def test_crop_is_multiple_of_network_downsampling(fixture_sequence_data):
    sh, eh, sw, ew = fixture_sequence_data.crop_positions
    assert (eh - sh) % 64 == 0 and (ew - sw) % 64 == 0


def test_intrinsics_match(fixture_sequence_data, reference_precompute):
    golden = np.asarray(list(reference_precompute["intrinsic"].values())[0])
    np.testing.assert_allclose(fixture_sequence_data.intrinsic_matrix, golden, rtol=1e-6)


def test_visibility_smoothing_matches(fixture_sequence_data, reference_precompute):
    golden = np.asarray(list(reference_precompute["view_indexes_per_point"].values())[0])
    np.testing.assert_array_equal(fixture_sequence_data.view_indexes_per_point, golden)


def test_global_scale_matches(fixture_sequence_data, reference_precompute):
    golden = float(list(reference_precompute["scale"].values())[0])
    assert fixture_sequence_data.estimated_scale == pytest.approx(golden, rel=1e-5)


def test_clean_point_list_matches(fixture_sequence_data, reference_precompute):
    golden = np.asarray(list(reference_precompute["clean"].values())[0])
    ours = fixture_sequence_data.clean_point_list
    assert ours.shape == golden.shape
    # photometric pipeline (bilateral filter) may differ across cv2 versions;
    # demand >= 99% agreement and identical inlier count within 3 points
    agreement = (ours == golden).mean()
    assert agreement >= 0.99, f"clean-point agreement {agreement}"


def test_extrinsics_projections_match(fixture_sequence_data, reference_precompute):
    golden_ext = [np.asarray(e) for e in list(reference_precompute["extrinsics"].values())[0]]
    for ours, ref in zip(fixture_sequence_data.extrinsics, golden_ext):
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)


def test_precompute_cache_roundtrip(tmp_path, fixture_sequence_data):
    seqs = {fixture_sequence_data.folder: fixture_sequence_data}
    path = tmp_path / "precompute_4.0_64_0.99.pkl"
    preprocess.save_precompute(path, seqs, 4.0, 64, 0.99)
    loaded = preprocess.load_precompute(path, [fixture_sequence_data.folder])
    seq = loaded[fixture_sequence_data.folder]
    assert seq.crop_positions == fixture_sequence_data.crop_positions
    np.testing.assert_allclose(seq.point_cloud, fixture_sequence_data.point_cloud, rtol=1e-6)
    np.testing.assert_array_equal(seq.mask_boundary, fixture_sequence_data.mask_boundary)
    assert seq.estimated_scale == pytest.approx(fixture_sequence_data.estimated_scale)


def test_load_reference_pickle_with_remap(fixture_seq, reference_precompute):
    """The reference's own pickle (recorded on another machine) loads via
    trailing-path-component remapping."""
    seqs = preprocess.load_precompute(
        "/root/reference/example_training_data_root/precompute_4.0_64_0.99.pkl",
        [str(fixture_seq)])
    assert str(fixture_seq) in seqs
    seq = seqs[str(fixture_seq)]
    assert seq.point_cloud.shape == (570, 4)
    assert seq.mask_boundary.shape == (256, 320)


def test_sanity_threshold_walk():
    rng = np.random.RandomState(0)
    arr = np.concatenate([rng.normal(10, 1, 5000), [30.0, 0.01]])
    lo, hi = preprocess.compute_sanity_threshold(arr, 0.99)
    assert lo < 10 < hi
    assert hi < 30  # the outlier is excluded from the band


def test_visibility_window_is_right_exclusive():
    vis = np.zeros((1, 10))
    vis[0, 5] = 1
    out = preprocess.overlapping_visible_view_indexes_per_point(vis.copy(), 2)
    # column i sums window [i-2, i+2) -> point visible at 5 contributes to 4,5,6,7
    np.testing.assert_array_equal(out[0], [0, 0, 0, 0, 1, 1, 1, 1, 0, 0])
