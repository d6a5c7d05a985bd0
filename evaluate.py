"""Evaluation driver (CLI parity with the reference evaluate.py).

Two phases (reference evaluate.py:119-346):
  validation — frame pairs with the full geometry stack; per batch a
      12-panel comparison image ``{batch}.png`` and a scaled-depth colored
      point cloud ``{batch}.ply``; also reports AbsRel and sigma-threshold
      metrics over the sparse ground truth (defined in the reference's
      losses.py:189-227 but never wired into its evaluate loop).
  test — single frames; raw predicted depth -> JET colormap
      ``{frame}.png`` (color | depth side by side) + unprojected point
      cloud ``{frame}.ply``.
"""
from __future__ import annotations

import argparse
import datetime
import random
from pathlib import Path

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from endoscopydepthestimation_pytorch_tpu import losses as loss_lib
from endoscopydepthestimation_pytorch_tpu import training
from endoscopydepthestimation_pytorch_tpu.data import readers
from endoscopydepthestimation_pytorch_tpu.data.dataset import BatchLoader, SfMDataset
from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57
from endoscopydepthestimation_pytorch_tpu.parallel import pad_batch_to
from endoscopydepthestimation_pytorch_tpu.utils import checkpoint as ckpt
from endoscopydepthestimation_pytorch_tpu.utils import visualization as viz
from endoscopydepthestimation_pytorch_tpu.utils.pointcloud import (
    point_cloud_from_depth, write_point_cloud)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Self-supervised Depth Estimation on Monocular Endoscopy "
                    "Dataset -- Evaluate (TPU)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--input_downsampling", type=float, default=4.0)
    p.add_argument("--input_size", nargs="+", type=int, required=True)
    p.add_argument("--selected_frame_index_list", nargs="+", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--num_pre_workers", type=int, default=8)
    p.add_argument("--adjacent_range", nargs="+", type=int, required=True)
    p.add_argument("--id_range", nargs="+", type=int, required=True)
    p.add_argument("--network_downsampling", type=int, default=64)
    p.add_argument("--inlier_percentage", type=float, default=0.995)
    p.add_argument("--testing_patient_id", nargs="+", default=[])
    p.add_argument("--load_intermediate_data", action="store_true")
    p.add_argument("--use_hsv_colorspace", action="store_true")
    p.add_argument("--architecture_summary", action="store_true")
    p.add_argument("--load_all_frames", action="store_true")
    p.add_argument("--trained_model_path", type=str, required=True)
    p.add_argument("--sequence_root", type=str, required=True)
    p.add_argument("--evaluation_result_root", type=str, required=True)
    p.add_argument("--evaluation_data_root", type=str, required=True)
    p.add_argument("--phase", type=str, required=True,
                   choices=["validation", "test"])
    p.add_argument("--visibility_overlap", type=int, default=30)
    # TPU-native extras
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["bfloat16", "float32"])
    p.add_argument("--rgb_mode", type=str, default="rgb")
    p.add_argument("--packed_conv", action=argparse.BooleanOptionalAction,
                   default=None, help="MXU shifted-weight conv packing "
                   "(exact; forward-only speedup at <=256x320-scale "
                   "inputs; default picks by resolution, PERF.md)")
    return p


def _make_state(args, height, width):
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    # packed: forward-only speedup at canonical resolutions; at 4x the
    # pixels the layout transforms outweigh the MXU-lane gain (PERF.md)
    packed = (height * width <= 160_000 if args.packed_conv is None
              else args.packed_conv)
    model = FCDenseNet57(n_classes=1, dtype=dtype, packed=packed)
    config = training.TrainConfig(compute_dtype=dtype)
    state = training.create_train_state(model, jax.random.PRNGKey(10085),
                                        (1, height, width, 3), config)
    if args.architecture_summary:
        # reference prints torchsummary in both evaluate phases
        # (evaluate.py:142,302 there); same flax tabulate as train.py
        import flax.linen as nn
        print(nn.tabulate(
            model, jax.random.PRNGKey(0),
            compute_flops=False, compute_vjp_flops=False)(
            jnp.zeros((1, height, width, 3), jnp.float32), train=False))
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
        print(f"FCDenseNet57: {n_params:,} parameters, input "
              f"{height}x{width}, dtype {args.compute_dtype}")
    if not Path(args.trained_model_path).exists():
        raise OSError("Trained model could not be found")
    state, epoch, _ = ckpt.load_any_checkpoint(args.trained_model_path, state)
    print(f"Restored model, epoch {epoch}, step {int(state.step)}")
    return state, config


def run_validation(args, log_root, height, width):
    data_root = Path(args.evaluation_data_root)
    sequence_root = Path(args.sequence_root)
    frame_list = (readers.read_visible_view_indexes(sequence_root)
                  if args.load_all_frames else args.selected_frame_index_list)
    if frame_list is None:
        raise IOError("provide --selected_frame_index_list or --load_all_frames")
    test_files = readers.get_filenames_from_frame_indexes(sequence_root, frame_list)
    folders = readers.get_parent_folder_names(data_root, args.id_range)

    dataset = SfMDataset(
        image_file_names=test_files, folder_list=folders,
        adjacent_range=args.adjacent_range, transform=None,
        downsampling=args.input_downsampling,
        network_downsampling=args.network_downsampling,
        inlier_percentage=args.inlier_percentage,
        visible_interval=args.visibility_overlap,
        use_store_data=args.load_intermediate_data, store_data_root=data_root,
        phase="validation", is_hsv=args.use_hsv_colorspace,
        num_pre_workers=args.num_pre_workers, rgb_mode=args.rgb_mode)
    # num_workers: host loader threads (the reference passes its flag to
    # DataLoader, evaluate.py:262-265 there); BatchLoader caps at core count
    loader = BatchLoader(dataset, args.batch_size, shuffle=False,
                         drop_last=False, num_workers=args.num_workers)

    state, config = _make_state(args, height, width)
    eval_fn = training.make_jit_eval_step(config, with_images=True)
    abs_rels, sigmas = [], []

    for batch_idx, batch in enumerate(loader):
        # pad the ragged final batch to the static batch size so every
        # batch reuses ONE compiled program (XLA retraces per shape);
        # per-sample outputs below are sliced back to the valid count
        padded = pad_batch_to(batch, args.batch_size)
        valid = padded.pop("_valid")
        device_batch = {k: jnp.asarray(v) for k, v in padded.items()
                        if not isinstance(v, list)}
        metrics = eval_fn(state, device_batch, jnp.asarray(config.dcl_weight))

        scaled_1 = np.asarray(metrics["scaled_depth_1"])[:valid]
        abs_rels.append(np.asarray(loss_lib.abs_rel_error(
            jnp.asarray(scaled_1), device_batch["sparse_depth_1"][:valid],
            device_batch["depth_mask_1"][:valid])))
        sigmas.append(np.stack([np.asarray(s) for s in loss_lib.threshold_metric(
            jnp.asarray(scaled_1), device_batch["sparse_depth_1"][:valid],
            device_batch["depth_mask_1"][:valid])], axis=0))  # (3, valid)

        panels_1 = viz.validation_panel(
            batch["color_1"], batch["sparse_depth_1"],
            scaled_1 * batch["boundary"],
            np.asarray(metrics["warped_depth_2_to_1"])[:valid],
            batch["flow_1"] * batch["boundary"],
            np.asarray(metrics["flows_from_depth_1"])[:valid] * batch["boundary"],
            batch["boundary"], is_hsv=args.use_hsv_colorspace)
        # frame-2 row renders the 1->2 warped depth (reference
        # evaluate.py:242-259), not the frame-2 prediction again
        panels_2 = viz.validation_panel(
            batch["color_2"], batch["sparse_depth_2"],
            np.asarray(metrics["scaled_depth_2"])[:valid] * batch["boundary"],
            np.asarray(metrics["warped_depth_1_to_2"])[:valid],
            batch["flow_2"] * batch["boundary"],
            np.asarray(metrics["flows_from_depth_2"])[:valid] * batch["boundary"],
            batch["boundary"], is_hsv=args.use_hsv_colorspace)
        image = viz.stack_panels(panels_1 + panels_2)
        cv2.imwrite(str(log_root / f"{batch_idx}.png"),
                    cv2.cvtColor(np.uint8(np.clip(image, 0, 1) * 255),
                                 cv2.COLOR_RGB2BGR))

        # scaled-depth point cloud of the first sample (evaluate.py:272-274)
        color = np.uint8((batch["color_1"][0] * 0.5 + 0.5) * 255)
        color_bgr = cv2.cvtColor(color, cv2.COLOR_RGB2BGR)
        cloud = point_cloud_from_depth(
            scaled_1[0, :, :, 0], color_bgr, batch["boundary"][0, :, :, 0],
            batch["intrinsic"][0], point_cloud_downsampling=1)
        write_point_cloud(str(log_root / f"{batch_idx}.ply"), cloud)
        print(f"batch {batch_idx}: loss {float(metrics['loss']):.5f}")

    abs_rel = float(np.concatenate(abs_rels).mean()) if abs_rels else float("nan")
    sig = np.concatenate(sigmas, axis=1)  # (3, total_samples)
    print(f"AbsRel {abs_rel:.5f}  "
          f"sigma<1.25 {float(sig[0].mean()):.4f}  "
          f"sigma<1.25^2 {float(sig[1].mean()):.4f}  "
          f"sigma<1.25^3 {float(sig[2].mean()):.4f}")
    with open(log_root / "metrics.json", "w") as f:
        import json
        json.dump({"abs_rel": abs_rel,
                   "sigma_1.25": float(sig[0].mean()),
                   "sigma_1.25^2": float(sig[1].mean()),
                   "sigma_1.25^3": float(sig[2].mean())}, f)


def run_test(args, log_root, height, width):
    data_root = Path(args.evaluation_data_root)
    sequence_root = Path(args.sequence_root)
    frame_list = (readers.read_visible_view_indexes(sequence_root)
                  if args.load_all_frames else args.selected_frame_index_list)
    if frame_list is None:
        raise IOError("provide --selected_frame_index_list or --load_all_frames")
    test_files = readers.get_filenames_from_frame_indexes(sequence_root, frame_list)
    folders = readers.get_parent_folder_names(data_root, args.id_range)

    dataset = SfMDataset(
        image_file_names=test_files, folder_list=folders,
        adjacent_range=args.adjacent_range, transform=None,
        downsampling=args.input_downsampling,
        network_downsampling=args.network_downsampling,
        inlier_percentage=args.inlier_percentage,
        visible_interval=args.visibility_overlap,
        use_store_data=args.load_intermediate_data, store_data_root=data_root,
        phase="test", is_hsv=args.use_hsv_colorspace,
        num_pre_workers=args.num_pre_workers, rgb_mode=args.rgb_mode)

    state, _ = _make_state(args, height, width)
    predict = jax.jit(training.predict_step)

    for idx in range(len(dataset)):
        sample = dataset[idx]
        colors = jnp.asarray(sample["color_1"])[None]
        boundary = jnp.asarray(sample["boundary"])[None]
        depth = np.asarray(predict(state, colors, boundary))[0, :, :, 0]

        boundary_np = sample["boundary"][:, :, 0]
        color_disp = np.uint8((sample["color_1"] * 0.5 + 0.5) * 255)
        if args.use_hsv_colorspace:
            color_disp = cv2.cvtColor(color_disp, cv2.COLOR_HSV2BGR_FULL)
        else:
            color_disp = cv2.cvtColor(color_disp, cv2.COLOR_RGB2BGR)
        color_disp = np.uint8(boundary_np[:, :, None] * color_disp)
        depth_masked = depth * boundary_np
        depth_vis = cv2.applyColorMap(
            np.uint8(255 * depth_masked / max(float(depth_masked.max()), 1e-12)),
            cv2.COLORMAP_JET)

        cloud = point_cloud_from_depth(depth_masked, color_disp, boundary_np,
                                       sample["intrinsic"],
                                       point_cloud_downsampling=1)
        write_point_cloud(str(log_root / f"{sample['name']}.ply"), cloud)
        cv2.imwrite(str(log_root / f"{sample['name']}.png"),
                    cv2.hconcat([color_disp, depth_vis]))
        print(f"frame {sample['name']}: depth range "
              f"[{depth_masked.min():.4f}, {depth_masked.max():.4f}]")


def main(argv=None):
    args = build_parser().parse_args(argv)
    height, width = args.input_size
    np.random.seed(10085)
    random.seed(10085)

    now = datetime.datetime.now()
    log_root = Path(args.evaluation_result_root) / (
        "depth_estimation_evaluation_run_{}_{}_{}_{}_test_id_{}".format(
            now.month, now.day, now.hour, now.minute,
            "_".join(str(i) for i in args.testing_patient_id)))
    log_root.mkdir(parents=True, exist_ok=True)
    print(f"Results at {log_root}")

    if args.phase == "validation":
        run_validation(args, log_root, height, width)
    else:
        run_test(args, log_root, height, width)


if __name__ == "__main__":
    main()
