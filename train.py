"""Self-supervised depth training driver (CLI parity with the reference).

Accepts the reference's exact flags (train.py:32-75 there) plus TPU-native
extras (--compute_dtype, --remat, --rgb_mode). The hot loop is one fused
jitted step on a 1-D data mesh over all local chips; host threads rasterize
and prefetch batches; metrics are read back one step late so the device
never waits on the (slow) host link.

Example (mirrors the reference README):
  python train.py --adjacent_range 5 30 --id_range 1 2 --input_size 256 320 \
      --batch_size 8 --num_iter 1000 --number_epoch 100 \
      --training_patient_id 1 --testing_patient_id 1 --validation_patient_id 1 \
      --training_result_root /tmp/run --training_data_root <data root>
"""
from __future__ import annotations

import argparse
import datetime
import random
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from endoscopydepthestimation_pytorch_tpu import training
from endoscopydepthestimation_pytorch_tpu.data import readers
from endoscopydepthestimation_pytorch_tpu.data.augment import TrainingAugmentation
from endoscopydepthestimation_pytorch_tpu.data.dataset import BatchLoader, SfMDataset
from endoscopydepthestimation_pytorch_tpu.models import (FCDenseNet57, FCDenseNet67,
                                                         FCDenseNet103)
from endoscopydepthestimation_pytorch_tpu.parallel import (device_prefetch,
                                                           host_local,
                                                           host_local_rows,
                                                           make_mesh_for_batch,
                                                           make_parallel_eval_step,
                                                           make_parallel_train_step,
                                                           multihost_barrier,
                                                           replicate_state, shard_batch)
from endoscopydepthestimation_pytorch_tpu.utils import checkpoint as ckpt
from endoscopydepthestimation_pytorch_tpu.utils import visualization as viz
from endoscopydepthestimation_pytorch_tpu.utils.profiling import StepTimer, device_trace

def _unet(n_classes=1, dtype=None, remat=False, fused=False, **flags):
    """UNet family entry (reference models.py:211-264 defines it; its
    drivers never instantiate it). The FCDenseNet-specific remat/fused/
    packed flags do not apply."""
    del remat, fused, flags
    from endoscopydepthestimation_pytorch_tpu.models import UNet
    return UNet(out_channels=n_classes, dtype=dtype)


MODELS = {"fcdensenet57": FCDenseNet57, "fcdensenet67": FCDenseNet67,
          "fcdensenet103": FCDenseNet103, "unet": _unet}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Self-supervised Depth Estimation on Monocular Endoscopy "
                    "Dataset -- Train (TPU)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--adjacent_range", nargs="+", type=int, required=True,
                   help="interval range for a pair of video frames")
    p.add_argument("--id_range", nargs="+", type=int, required=True,
                   help="id range for the training and testing dataset")
    p.add_argument("--input_downsampling", type=float, default=4.0,
                   help="image downsampling rate")
    p.add_argument("--input_size", nargs="+", type=int, required=True,
                   help="resolution of network input")
    p.add_argument("--batch_size", type=int, default=8,
                   help="GLOBAL batch size (split across chips)")
    p.add_argument("--num_workers", type=int, default=8,
                   help="host loader threads")
    p.add_argument("--num_pre_workers", type=int, default=8,
                   help="processes for preprocessing intermediate data")
    p.add_argument("--dcl_weight", type=float, default=5.0,
                   help="weight for depth consistency loss after warmup")
    p.add_argument("--sfl_weight", type=float, default=20.0,
                   help="weight for sparse flow loss")
    p.add_argument("--max_lr", type=float, default=1.0e-3)
    p.add_argument("--min_lr", type=float, default=1.0e-4)
    p.add_argument("--num_iter", type=int, default=1000,
                   help="iterations per epoch (also the cyclic-LR half cycle)")
    p.add_argument("--network_downsampling", type=int, default=64)
    p.add_argument("--inlier_percentage", type=float, default=0.99)
    p.add_argument("--validation_interval", type=int, default=1)
    p.add_argument("--zero_division_epsilon", type=float, default=1.0e-8)
    p.add_argument("--display_interval", type=int, default=10)
    p.add_argument("--training_patient_id", nargs="+", required=True)
    p.add_argument("--testing_patient_id", nargs="+", required=True)
    p.add_argument("--validation_patient_id", nargs="+", required=True)
    p.add_argument("--load_intermediate_data", action="store_true")
    p.add_argument("--load_trained_model", action="store_true")
    p.add_argument("--number_epoch", type=int, required=True)
    p.add_argument("--visibility_overlap", type=int, default=30)
    p.add_argument("--use_hsv_colorspace", action="store_true")
    p.add_argument("--training_result_root", type=str, required=True)
    p.add_argument("--training_data_root", type=str, required=True)
    p.add_argument("--architecture_summary", action="store_true")
    p.add_argument("--trained_model_path", type=str, default=None)
    # TPU-native extras
    p.add_argument("--architecture", type=str, default="fcdensenet57",
                   choices=sorted(MODELS))
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--remat", action="store_true",
                   help="rematerialize dense blocks (needed for fp32 batch 8)")
    p.add_argument("--fused_convs", action="store_true",
                   help="use the Pallas fused dense-conv engine (wins on "
                        "isolated layers; measured slower end-to-end than "
                        "XLA's cross-op fusion — see PERF.md)")
    p.add_argument("--block_engine", action="store_true",
                   help="whole-block Pallas dense-block engine (forward AND "
                        "backward in Pallas, ops/block_engine.py). Measured "
                        "at parity with the XLA default on v5e (PERF.md "
                        "round 3) — kept for A/B and for hardware where "
                        "the tradeoff differs")
    p.add_argument("--segmented_last_up", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="segment-decompose only the final full-resolution "
                        "up block (its materialized concat is the biggest "
                        "single op of the step); measured 172.3 vs 176.4 "
                        "ms/step on v5e — PERF.md round 3. "
                        "--no-segmented_last_up restores the materialized "
                        "block")
    p.add_argument("--split_last_skip", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="with --segmented_last_up: feed up4 the [up, skip] "
                        "pair as separate segments instead of materializing "
                        "the 144-channel full-res concat (which pads to 256 "
                        "lanes). Measured 171.2 vs 172.3 ms/step at 256x320 "
                        "and 445.1 vs 452.1 at 512x640 (round-4 A/B, "
                        "scripts/ab_step.py split_skip); f32 "
                        "forward+gradient parity with the materialized "
                        "model is asserted in tests/test_model.py")
    p.add_argument("--act8", action="store_true",
                   help="fp8 (e4m3) compressed-activation backward in the "
                        "dense blocks (ops/act8.py): exact forward; each "
                        "block saves only an e4m3 copy of its input and "
                        "replays in the backward. MEASURED NEGATIVE on "
                        "v5e-16G (PERF.md round-3 close-out): slower at "
                        "256x320 (replay re-pays the forward's HBM bytes) "
                        "and no capacity unlock at 512x640 (the replay's "
                        "backward working set dominates); kept for larger-"
                        "HBM parts. Gradients deviate within a per-block "
                        "quantization envelope (outside strict reference "
                        "numerics; accuracy study in tests/test_act8.py)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="gradient-accumulation microbatches per step: the "
                        "capacity lever for the reference's canonical "
                        "batch 8 at 512x640 on 16G HBM (--batch_size 8 "
                        "--grad_accum 2 --remat). One clipped SGD update "
                        "on the mean gradient; BN normalizes per "
                        "microbatch and running stats advance per "
                        "microbatch (training.train_step docstring)")
    p.add_argument("--rgb_mode", type=str, default="rgb")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler device trace of epoch 0 here")
    p.add_argument("--log_interval", type=int, default=10,
                   help="steps between metric readbacks (each costs a "
                        "device->host round trip); set 1 for the "
                        "reference's per-iteration scalar granularity "
                        "(its train.py:348-350)")
    # multi-host (DCN): run one copy of this CLI per host; each host's
    # loader feeds its contiguous slice of every global batch (the
    # TPU-native equivalent of the reference's per-process DataLoader
    # workers, train.py:186-189 there). Values default from the JAX
    # cluster env (TPU pods auto-detect); set all three for manual setups.
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (multi-host training)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="total number of host processes")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's id in [0, num_processes)")
    return p


class _NullWriter:
    """Metric sink for non-zero processes in multi-host runs."""

    def add_image(self, *a, **k):
        pass

    def add_scalars(self, *a, **k):
        pass

    def export_scalars_to_json(self, *a, **k):
        pass

    def close(self):
        pass


def main(argv=None):
    args = build_parser().parse_args(argv)
    height, width = args.input_size

    if (args.coordinator_address is not None or args.num_processes is not None
            or args.process_id is not None):
        # multi-host entry: every host runs this same CLI; JAX's distributed
        # runtime makes jax.devices() global and the jitted step's gradient
        # psum ride the ICI/DCN mesh
        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes, process_id=args.process_id)
        # Establish the cross-host communicator NOW, at a synchronized
        # point: its lazy init inside the first real step does a KV-store
        # handshake with a hard ~30 s deadline ("Gloo context
        # initialization failed: GetKeyValue() timed out"), and on loaded
        # hosts the two processes' thunk executors can reach the step's
        # first collective >30 s apart. A barrier followed by a trivial
        # all-device collective performs the handshake while every host
        # is microseconds from it; the communicator is cached for the
        # real programs. No-op on TPU pods in effect (ICI init is eager).
        multihost_barrier("collective_warmup")
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("collective_warmup")
    proc, nproc = jax.process_index(), jax.process_count()
    is_main = proc == 0

    np.random.seed(10085)
    random.seed(10085)

    now = datetime.datetime.now()
    log_root = Path(args.training_result_root) / (
        "depth_estimation_train_run_{}_{}_{}_{}_test_id_{}".format(
            now.month, now.day, now.hour, now.minute,
            "_".join(str(i) for i in args.testing_patient_id)))
    if is_main:
        log_root.mkdir(parents=True, exist_ok=True)
        writer = viz.MetricWriter(log_root)
        print(f"Logs at {log_root}")
    else:
        writer = _NullWriter()

    data_root = Path(args.training_data_root)
    train_files, val_files, _ = readers.get_color_file_names_by_bag(
        data_root, args.training_patient_id, args.validation_patient_id,
        args.testing_patient_id)
    folders = readers.get_parent_folder_names(data_root, args.id_range)

    transform = TrainingAugmentation(seed=10085)
    train_dataset = SfMDataset(
        image_file_names=train_files, folder_list=folders,
        adjacent_range=args.adjacent_range, transform=transform,
        downsampling=args.input_downsampling,
        network_downsampling=args.network_downsampling,
        inlier_percentage=args.inlier_percentage,
        visible_interval=args.visibility_overlap,
        use_store_data=args.load_intermediate_data, store_data_root=data_root,
        phase="train", is_hsv=args.use_hsv_colorspace,
        num_pre_workers=args.num_pre_workers, rgb_mode=args.rgb_mode,
        num_iter=args.num_iter)  # samples per epoch (reference train.py:51)
    val_dataset = SfMDataset(
        image_file_names=val_files, folder_list=folders,
        adjacent_range=args.adjacent_range, transform=None,
        downsampling=args.input_downsampling,
        network_downsampling=args.network_downsampling,
        inlier_percentage=args.inlier_percentage,
        visible_interval=args.visibility_overlap,
        use_store_data=True, store_data_root=data_root,
        phase="validation", is_hsv=args.use_hsv_colorspace,
        num_pre_workers=args.num_pre_workers, rgb_mode=args.rgb_mode)

    # num_workers: host loader threads (the reference's DataLoader workers,
    # train.py:186-189 there); BatchLoader additionally caps at the core
    # count (more threads than cores thrash — PERF.md loader bench)
    train_loader = BatchLoader(train_dataset, args.batch_size, shuffle=True,
                               num_workers=args.num_workers,
                               seed=10085, process_index=proc,
                               process_count=nproc)
    val_loader = BatchLoader(val_dataset, args.batch_size, shuffle=False,
                             num_workers=args.num_workers,
                             seed=10085, drop_last=True, process_index=proc,
                             process_count=nproc)

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    fused = args.fused_convs and jax.default_backend() == "tpu"
    model = MODELS[args.architecture](n_classes=1, dtype=dtype,
                                      remat=args.remat, fused=fused,
                                      block_engine=args.block_engine,
                                      act8=args.act8,
                                      # act8 compresses only the block-VJP
                                      # (materialized) path; keeping the last
                                      # up block segment-decomposed would
                                      # exempt the LARGEST activation
                                      # producer (full-res) from the fp8
                                      # saves, so act8 takes precedence
                                      segmented_last_up=(
                                          args.segmented_last_up
                                          and not args.act8),
                                      split_last_skip=args.split_last_skip)
    config = training.TrainConfig(
        sfl_weight=args.sfl_weight, dcl_weight=args.dcl_weight,
        max_lr=args.max_lr, min_lr=args.min_lr, lr_step_size=args.num_iter,
        zero_division_epsilon=args.zero_division_epsilon, compute_dtype=dtype)

    state = training.create_train_state(model, jax.random.PRNGKey(10085),
                                        (1, height, width, 3), config)
    if args.architecture_summary:
        # layer-by-layer table (the reference prints torchsummary's,
        # train.py:199-200 there); flax's tabulate is the native equivalent
        import flax.linen as nn
        print(nn.tabulate(
            model, jax.random.PRNGKey(0),
            compute_flops=False, compute_vjp_flops=False)(
            jnp.zeros((1, height, width, 3), jnp.float32), train=False))
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
        print(f"{args.architecture}: {n_params:,} parameters, input "
              f"{height}x{width}, dtype {args.compute_dtype}")

    start_epoch = 0
    if args.load_trained_model:
        if args.trained_model_path is None or not Path(args.trained_model_path).exists():
            raise OSError("No trained model detected")
        state, start_epoch, _ = ckpt.load_any_checkpoint(args.trained_model_path, state)
        print(f"Restored model, epoch {start_epoch}, step {int(state.step)}")

    mesh = make_mesh_for_batch(args.batch_size)
    n_mesh = len(mesh.devices.ravel())
    if is_main:
        print(f"Data-parallel mesh over {n_mesh} "
              f"device(s), {nproc} host process(es)")
    if args.grad_accum > 1 and (args.batch_size // n_mesh) % args.grad_accum:
        # row-strided microbatches keep every device busy only when each
        # device's contiguous batch rows split evenly over the microbatches;
        # otherwise XLA inserts per-microbatch resharding (all-to-all) and
        # devices idle (training.train_step docstring)
        raise ValueError(
            f"per-device batch {args.batch_size // n_mesh} must be divisible "
            f"by --grad_accum {args.grad_accum} (global batch "
            f"{args.batch_size} over {n_mesh} devices)")
    state = replicate_state(state, mesh)
    train_step = make_parallel_train_step(config, mesh,
                                          grad_accum=args.grad_accum)
    # display-step variant additionally returns the board images
    # (reference emits a 4-panel training board every display_interval
    # iterations, train.py:353-371 there)
    train_step_display = make_parallel_train_step(config, mesh, with_images=True,
                                                  grad_accum=args.grad_accum)
    # use_batch_stats: the reference never flips its model to eval mode in
    # the training-loop validation (its train.py:234, 380)
    eval_step = make_parallel_eval_step(config, mesh, with_images=True,
                                        use_batch_stats=True)

    # Multi-host: AOT-compile each collective program once and barrier
    # through the coordination service before its first execution —
    # compile-time skew between hosts can exceed the Gloo rendezvous'
    # hard 30 s deadline at the first cross-host collective.
    aot_cache = {}

    def run_step(name, fn, *step_args):
        if nproc == 1:
            return fn(*step_args)
        if name not in aot_cache:
            aot_cache[name] = fn.lower(*step_args).compile()
            multihost_barrier(f"{name}_compiled")
        return aot_cache[name](*step_args)

    mean_sfl = 0.0
    timer = StepTimer()
    for epoch in range(start_epoch, args.number_epoch + 1):
        train_dataset.seed(10086 + epoch)
        train_loader.set_epoch(epoch)
        timer.reset_epoch()
        dcl_weight = jnp.asarray(training.dcl_weight_for_epoch(epoch, config),
                                 jnp.float32)

        pending = None  # one-step-delayed metric readback
        means = {}
        count = 0
        with device_trace(args.profile_dir,
                          enabled=(args.profile_dir is not None
                                   and epoch == start_epoch)):
            for batch_idx, device_batch in enumerate(
                    device_prefetch(train_loader, mesh)):
                display = (args.display_interval > 0
                           and batch_idx % args.display_interval == 0)
                if display:
                    state, metrics = run_step("train_display",
                                              train_step_display,
                                              state, device_batch, dcl_weight)
                    # 8-row board: c1,d1,sf1,df1,c2,d2,sf2,df2 (reference
                    # train.py:353-371); host_local = this host's rows in
                    # multi-host runs (np.asarray cannot read remote shards).
                    # Inputs are batch-sharded by shard_batch; the metrics
                    # IMAGE outputs' sharding is compiler-chosen, so
                    # host_local_rows slices to local rows if one comes
                    # back replicated.
                    local_bs = args.batch_size // nproc
                    boundary = host_local(device_batch["boundary"])
                    panels = []
                    for f in ("1", "2"):
                        panels += viz.training_panel(
                            host_local(device_batch[f"color_{f}"]),
                            host_local_rows(metrics[f"scaled_depth_{f}"],
                                            proc, local_bs) * boundary,
                            host_local(device_batch[f"flow_{f}"]) * boundary,
                            host_local_rows(metrics[f"flows_from_depth_{f}"],
                                            proc, local_bs),
                            is_hsv=args.use_hsv_colorspace)
                    writer.add_image("Training/Images/Results",
                                     viz.stack_panels(panels), int(state.step))
                    metrics = {k: v for k, v in metrics.items()
                               if k not in ("scaled_depth_1", "scaled_depth_2",
                                            "flows_from_depth_1",
                                            "flows_from_depth_2")}
                else:
                    state, metrics = run_step("train", train_step,
                                              state, device_batch, dcl_weight)
                if pending is not None and batch_idx % args.log_interval == 0:
                    vals = {k: float(v) for k, v in pending.items()
                            if k in ("loss", "sparse_flow_loss",
                                     "depth_consistency_loss")}
                    timer.tick()
                    count += 1
                    for k, v in vals.items():
                        means[k] = means.get(k, 0.0) + (v - means.get(k, 0.0)) / count
                    step_idx = int(state.step)
                    writer.add_scalars("Training", {
                        "overall": means["loss"],
                        "depth_consistency": means["depth_consistency_loss"],
                        "sparse_flow": means["sparse_flow_loss"]}, step_idx)
                    if batch_idx % 50 == 0 and is_main:
                        print(f"epoch {epoch} it {batch_idx} "
                              f"loss {vals['loss']:.5f} (avg {means['loss']:.5f}) "
                              f"sfl {vals['sparse_flow_loss']:.5f} "
                              f"dcl {vals['depth_consistency_loss']:.5f}")
                pending = metrics
        if pending is not None and is_main:
            print(f"epoch {epoch} final loss {float(pending['loss']):.5f}")
        summary = timer.summary()
        if summary and is_main:
            # ticks happen once per log_interval steps
            scale = max(1, args.log_interval)
            print(f"epoch {epoch} step time: mean {summary['mean_ms']/scale:.1f} ms, "
                  f"p50 {summary['p50_ms']/scale:.1f}, "
                  f"p90 {summary['p90_ms']/scale:.1f}")

        if epoch % args.validation_interval != 0:
            continue

        # validation (reference train.py:378-485)
        val_means = {}
        n = 0
        for batch_idx, batch in enumerate(val_loader):
            device_batch = shard_batch(batch, mesh)
            metrics = run_step("eval", eval_step, state, device_batch, dcl_weight)
            n += 1
            for k in ("loss", "sparse_flow_loss", "depth_consistency_loss"):
                v = float(metrics[k])
                val_means[k] = val_means.get(k, 0.0) + (v - val_means.get(k, 0.0)) / n
            if args.display_interval > 0 and batch_idx % args.display_interval == 0:
                # 8-row board, both frames (reference train.py:461-479);
                # `batch` is this host's local rows, matching host_local's
                # view of the sharded metrics
                local_bs = batch["boundary"].shape[0]
                panels = []
                for f in ("1", "2"):
                    panels += viz.training_panel(
                        np.asarray(batch[f"color_{f}"]),
                        host_local_rows(metrics[f"scaled_depth_{f}"],
                                        proc, local_bs) * batch["boundary"],
                        batch[f"flow_{f}"] * batch["boundary"],
                        host_local_rows(metrics[f"flows_from_depth_{f}"],
                                        proc, local_bs),
                        is_hsv=args.use_hsv_colorspace)
                writer.add_image("Validation/Images/Results",
                                 viz.stack_panels(panels), int(state.step))
        if val_means:
            writer.add_scalars("Validation", {
                "overall": val_means["loss"],
                "depth_consistency": val_means["depth_consistency_loss"],
                "sparse_flow": val_means["sparse_flow_loss"]}, epoch)
        mean_sfl = val_means.get("sparse_flow_loss", mean_sfl)

        # EVERY process calls save: orbax coordinates multi-process saves
        # internally (sync_global_processes) and only the primary host
        # writes — a main-only call deadlocks process 0 inside orbax
        # until the other hosts' barrier deadline kills the job
        # (root-caused on the 2-process CLI, PERF.md round 5).
        model_path = log_root / f"checkpoint_model_epoch_{epoch}_validation_{mean_sfl}"
        ckpt.save_checkpoint(model_path, state, epoch + 1, mean_sfl)
        if is_main:
            writer.export_scalars_to_json(log_root / f"all_scalars_{epoch}.json")
            print(f"epoch {epoch}: validation sfl {mean_sfl:.5f}, saved {model_path}")

    writer.close()
    # Leave together: process 0's end-of-epoch work (orbax checkpoint
    # save, scalar export) outlasts the other processes' loops, and a
    # process that exits early starts the distributed runtime's Shutdown
    # barrier, whose short deadline then KILLS the still-saving process 0
    # ("Terminating process because the JAX distributed service detected
    # fatal errors"). This barrier has a minutes-scale timeout instead.
    multihost_barrier("train_done")


if __name__ == "__main__":
    main()
