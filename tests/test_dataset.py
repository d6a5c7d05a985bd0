"""L2 dataset/sampler behavior on the bag_1 fixture."""
import numpy as np
import pytest

from endoscopydepthestimation_pytorch_tpu.data import readers
from endoscopydepthestimation_pytorch_tpu.data.dataset import (
    BatchLoader, SfMDataset, generating_pos_and_increment)


@pytest.fixture(scope="module")
def train_dataset(fixture_root, fixture_seq, tmp_path_factory):
    train, _, _ = readers.get_color_file_names_by_bag(fixture_root, 1, 1, 1)
    store = tmp_path_factory.mktemp("precompute")
    return SfMDataset(image_file_names=train, folder_list=[fixture_seq],
                      adjacent_range=(5, 30), transform=None, downsampling=4.0,
                      network_downsampling=64, inlier_percentage=0.99,
                      visible_interval=30, use_store_data=False,
                      store_data_root=store, phase="train", is_hsv=False,
                      num_pre_workers=1, rgb_mode="rgb", num_iter=32)


def test_pair_increment_constraints():
    import random
    rng = random.Random(0)
    visible = list(range(100, 135))  # 35 views
    for idx in range(200):
        pos, inc = generating_pos_and_increment(idx, visible, [5, 30], rng)
        assert 0 <= pos < 35
        assert 0 <= pos + inc < 35
        assert 5 <= abs(inc) <= 30


def test_pair_increment_short_sequence():
    import random
    rng = random.Random(0)
    visible = list(range(8))  # shorter than 2*adjacent_range[0]
    for idx in range(50):
        pos, inc = generating_pos_and_increment(idx, visible, [5, 30], rng)
        assert 0 <= pos + inc < 8 and inc != 0


def test_train_sample_shapes_and_ranges(train_dataset):
    s = train_dataset[0]
    assert s["color_1"].shape == (256, 320, 3)
    assert s["color_1"].min() >= -1.0 and s["color_1"].max() <= 1.0
    assert s["sparse_depth_1"].shape == (256, 320, 1)
    assert s["flow_1"].shape == (256, 320, 2)
    assert s["boundary"].shape == (256, 320, 1)
    assert set(np.unique(s["boundary"])) <= {0.0, 1.0}
    assert s["rotation_1_wrt_2"].shape == (3, 3)
    assert s["translation_1_wrt_2"].shape == (3, 1)
    assert s["intrinsic"].shape == (3, 3)
    assert s["depth_mask_1"].sum() > 0 and s["depth_mask_2"].sum() > 0


def test_relative_pose_consistency(train_dataset):
    s = train_dataset[3]
    r12, r21 = s["rotation_1_wrt_2"], s["rotation_2_wrt_1"]
    t12, t21 = s["translation_1_wrt_2"], s["translation_2_wrt_1"]
    np.testing.assert_allclose(r12 @ r21, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(t21, -r12.T @ t12, atol=1e-6)
    # rotations orthonormal
    np.testing.assert_allclose(r12 @ r12.T, np.eye(3), atol=1e-5)


def test_sparse_depth_scaled_by_global_scale(train_dataset):
    seq = list(train_dataset.sequences.values())[0]
    s = train_dataset[0]
    d = s["sparse_depth_1"][s["depth_mask_1"] > 0.5]
    # depths divided by estimated scale (3.856...) land around O(0.1-1)
    assert 0 < d.min() and d.max() < 10.0
    assert seq.estimated_scale == pytest.approx(3.8563907, rel=1e-4)


def test_test_phase_sample(fixture_root, fixture_seq, tmp_path):
    _, _, test = readers.get_color_file_names_by_bag(fixture_root, 1, 1, 1)
    ds = SfMDataset(image_file_names=test, folder_list=[fixture_seq],
                    downsampling=4.0, network_downsampling=64,
                    inlier_percentage=0.99, visible_interval=30,
                    use_store_data=False, store_data_root=tmp_path,
                    phase="test", is_hsv=False, num_pre_workers=1, rgb_mode="rgb")
    s = ds[0]
    assert s["color_1"].shape == (256, 320, 3)
    assert s["name"] == "00004584"
    assert len(ds) == 35


def test_batch_loader_shapes_and_determinism(train_dataset):
    loader = BatchLoader(train_dataset, batch_size=4, shuffle=True, seed=123)
    loader.set_epoch(0)
    train_dataset.seed(10086)
    batches_a = [b["color_1"].copy() for b in loader]
    assert len(batches_a) == 8
    assert batches_a[0].shape == (4, 256, 320, 3)
    loader.set_epoch(0)
    train_dataset.seed(10086)
    batches_b = [b["color_1"].copy() for b in loader]
    for a, b in zip(batches_a, batches_b):
        np.testing.assert_array_equal(a, b)


def test_batch_loader_process_partition(train_dataset):
    """Two partitioned loaders (process_count=2) reassemble each global
    batch exactly as the unpartitioned loader builds it — rows AND their
    per-sample RNG draws (multi-host contract, BatchLoader docstring)."""
    full = BatchLoader(train_dataset, batch_size=4, shuffle=True, seed=123)
    full.set_epoch(3)
    parts = [BatchLoader(train_dataset, batch_size=4, shuffle=True, seed=123,
                         process_index=i, process_count=2) for i in range(2)]
    for p in parts:
        p.set_epoch(3)

    global_batches = [b for b in full][:3]
    local_0 = [b for b in parts[0]][:3]
    local_1 = [b for b in parts[1]][:3]
    for g, l0, l1 in zip(global_batches, local_0, local_1):
        assert l0["color_1"].shape[0] == 2
        for key in ("color_1", "sparse_depth_1", "flow_2", "intrinsic"):
            np.testing.assert_array_equal(
                g[key], np.concatenate([l0[key], l1[key]], axis=0))


def test_batch_loader_throughput_floor(train_dataset):
    """The host pipeline's GIL assumption (jpeg decode / native rasterize /
    augment release the GIL — BatchLoader docstring) is measured, not
    trusted: a pure-Python addition that serialized the pipeline would
    drop throughput an order of magnitude below this floor. Measured
    37.8 ms/sample on this 1-core class of box (PERF.md); the floor is
    ~5x slack for suite contention."""
    import time
    loader = BatchLoader(train_dataset, batch_size=4, shuffle=False, seed=7)
    it = iter(loader)
    next(it)  # warm caches (sequence data already resident via fixture)
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        n += batch["color_1"].shape[0]
        if n >= 16:
            break
    per_sample_ms = 1000.0 * (time.perf_counter() - t0) / n
    assert per_sample_ms < 200.0, (
        f"loader {per_sample_ms:.1f} ms/sample — host pipeline regression "
        "(expected ~40 ms/sample on a 1-core box)")


def test_batch_loader_rejects_indivisible_partition(train_dataset):
    import pytest
    with pytest.raises(ValueError):
        BatchLoader(train_dataset, batch_size=3, shuffle=False,
                    process_index=0, process_count=2)


def test_augmentation_pipeline_preserves_dtype_shape():
    from endoscopydepthestimation_pytorch_tpu.data.augment import TrainingAugmentation
    aug = TrainingAugmentation(seed=0)
    img = np.random.RandomState(0).randint(0, 255, (64, 80, 3), dtype=np.uint8)
    outs = [aug(img) for _ in range(8)]
    assert all(o.shape == img.shape and o.dtype == np.uint8 for o in outs)
    # at least one augmentation actually changed the image
    assert any(not np.array_equal(o, img) for o in outs)
