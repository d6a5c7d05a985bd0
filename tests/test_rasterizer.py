"""Sparse-label rasterizer correctness: brute-force per-point oracle +
invariants on the bag_1 fixture."""
import numpy as np

from endoscopydepthestimation_pytorch_tpu.data.rasterizer import rasterize_pair


def _oracle(pair_extrinsics, pair_projections, pair_indexes, point_cloud,
            mask_boundary, view_indexes_per_point, clean_point_list,
            visible_view_indexes):
    """Slow, per-point re-derivation of the reference scatter semantics
    (reference utils.py:460-612) for testing."""
    h, w = mask_boundary.shape[:2]
    pts = np.asarray(point_cloud, dtype=np.float64)
    out = []
    for frame in range(2):
        this_col = visible_view_indexes.index(pair_indexes[frame])
        proj_this = np.asarray(pair_projections[frame])
        ext_this = np.asarray(pair_extrinsics[frame])
        proj_other = np.asarray(pair_projections[1 - frame])

        depth = np.zeros((h, w), np.float32)
        dmask = np.zeros((h, w), np.float32)
        flow = np.zeros((h, w, 2), np.float32)
        fmask = np.zeros((h, w), np.float32)
        for p in range(pts.shape[0]):
            if view_indexes_per_point[p, this_col] <= 0.5:
                continue
            if clean_point_list.size and clean_point_list[p] <= 0.5:
                continue
            uvw = proj_this @ pts[p]
            uv = np.round(uvw / uvw[2])
            cam = ext_this @ pts[p]
            cam = cam / cam[3]
            if not (0 <= uv[0] <= w - 1 and 0 <= uv[1] <= h - 1 and cam[2] > 0):
                continue
            x, y = int(np.round(uv[0])), int(np.round(uv[1]))
            if mask_boundary[y, x] != 255:
                continue
            uvw2 = proj_other @ pts[p]
            uv2 = np.round(uvw2 / uvw2[2])
            fx = (uv2[0] - uv[0]) / w
            fy = (uv2[1] - uv[1]) / h
            depth[y, x] = cam[2]
            dmask[y, x] = 1.0
            if abs(fx) > 5.0 or abs(fy) > 5.0:
                flow[y, x] = 0.0
                fmask[y, x] = 0.0
            else:
                flow[y, x] = (fx, fy)
                fmask[y, x] = 1.0
        out.append((dmask, depth, fmask, flow))
    return out


def test_rasterizer_matches_oracle(fixture_sequence_data):
    seq = fixture_sequence_data
    pos, inc = 10, 8
    pair_indexes = [seq.visible_view_indexes[pos], seq.visible_view_indexes[pos + inc]]
    args = dict(pair_extrinsics=[seq.extrinsics[pos], seq.extrinsics[pos + inc]],
                pair_projections=[seq.projections[pos], seq.projections[pos + inc]],
                pair_indexes=pair_indexes, point_cloud=seq.point_cloud,
                mask_boundary=seq.mask_boundary,
                view_indexes_per_point=seq.view_indexes_per_point,
                clean_point_list=seq.clean_point_list,
                visible_view_indexes=seq.visible_view_indexes)
    dmask, depth, fmask, flow = rasterize_pair(**args)
    oracle = _oracle(**args)
    for frame in range(2):
        o_dmask, o_depth, o_fmask, o_flow = oracle[frame]
        np.testing.assert_array_equal(dmask[frame, :, :, 0], o_dmask)
        np.testing.assert_allclose(depth[frame, :, :, 0], o_depth, rtol=1e-6)
        np.testing.assert_array_equal(fmask[frame, :, :, 0], o_fmask)
        np.testing.assert_allclose(flow[frame], o_flow, rtol=1e-6, atol=1e-8)


def test_rasterizer_has_labels_and_respects_mask(fixture_sequence_data):
    seq = fixture_sequence_data
    pos, inc = 0, 10
    dmask, depth, fmask, flow = rasterize_pair(
        pair_extrinsics=[seq.extrinsics[pos], seq.extrinsics[pos + inc]],
        pair_projections=[seq.projections[pos], seq.projections[pos + inc]],
        pair_indexes=[seq.visible_view_indexes[pos], seq.visible_view_indexes[pos + inc]],
        point_cloud=seq.point_cloud, mask_boundary=seq.mask_boundary,
        view_indexes_per_point=seq.view_indexes_per_point,
        clean_point_list=seq.clean_point_list,
        visible_view_indexes=seq.visible_view_indexes)
    assert dmask.sum() > 50  # hundreds of visible points land
    assert (depth >= 0).all()
    assert depth[dmask > 0.5].min() > 0
    # labels only on mask==255 pixels
    offmask = (np.asarray(seq.mask_boundary) != 255)
    assert dmask[0, :, :, 0][offmask].sum() == 0
    assert fmask[0, :, :, 0][offmask].sum() == 0
    # flow normalization keeps values small for adjacent frames
    assert np.abs(flow).max() <= 5.0


def test_native_rasterizer_matches_numpy(fixture_sequence_data):
    """The C++ rasterizer must reproduce the numpy implementation exactly
    (same rounding, scatter order, and f32 arithmetic)."""
    from endoscopydepthestimation_pytorch_tpu.data import native
    if not native.native_available():
        import pytest
        pytest.skip("no C++ toolchain")
    seq = fixture_sequence_data
    for pos, inc in [(10, 8), (0, 10), (20, -7)]:
        args = dict(pair_extrinsics=[seq.extrinsics[pos], seq.extrinsics[pos + inc]],
                    pair_projections=[seq.projections[pos], seq.projections[pos + inc]],
                    pair_indexes=[seq.visible_view_indexes[pos],
                                  seq.visible_view_indexes[pos + inc]],
                    point_cloud=seq.point_cloud, mask_boundary=seq.mask_boundary,
                    view_indexes_per_point=seq.view_indexes_per_point,
                    clean_point_list=seq.clean_point_list,
                    visible_view_indexes=seq.visible_view_indexes)
        ours = native.rasterize_pair_native(**args)
        golden = rasterize_pair(**args)
        for a, b in zip(ours, golden):
            np.testing.assert_array_equal(a, b)


def test_native_rasterizer_throughput(fixture_sequence_data):
    """Sanity perf check: native path at least as fast as numpy on a
    scaled-up (50k point) cloud."""
    from endoscopydepthestimation_pytorch_tpu.data import native
    if not native.native_available():
        import pytest
        pytest.skip("no C++ toolchain")
    import time
    seq = fixture_sequence_data
    reps = 88
    big_points = np.tile(np.asarray(seq.point_cloud), (reps, 1))
    big_vis = np.tile(seq.view_indexes_per_point, (reps, 1))
    big_clean = np.tile(seq.clean_point_list, reps)
    args = dict(pair_extrinsics=[seq.extrinsics[0], seq.extrinsics[10]],
                pair_projections=[seq.projections[0], seq.projections[10]],
                pair_indexes=[seq.visible_view_indexes[0], seq.visible_view_indexes[10]],
                point_cloud=big_points, mask_boundary=seq.mask_boundary,
                view_indexes_per_point=big_vis, clean_point_list=big_clean,
                visible_view_indexes=seq.visible_view_indexes)

    def timeit(fn, n=5):
        fn(**args)
        t0 = time.perf_counter()
        for _ in range(n):
            fn(**args)
        return (time.perf_counter() - t0) / n

    t_native = timeit(native.rasterize_pair_native)
    t_numpy = timeit(rasterize_pair)
    print(f"native {t_native*1000:.2f} ms vs numpy {t_numpy*1000:.2f} ms "
          f"({50160} points)")
    assert t_native < t_numpy * 1.5  # generous: must not be slower
