"""Loader/device-overlap proof (round-1 verdict item #8).

Three measurements on the bag_1 fixture (FCDenseNet-57 train step,
batch 8, 256x320, bf16):

  1. host per-sample pipeline cost (jpeg decode + rasterize + augment),
     single-threaded, plus the BatchLoader's end-to-end batches/s;
  2. pre-staged device step rate: one resident device batch, N steps;
  3. live-loader step rate: loader -> device_put -> step.

The "host pipeline keeps the TPU busy" claim: per-sample cost x batch
size vs device step time, scaled by host cores (the loader's per-sample
work is thread-parallel; cv2/rasterizer release the GIL). This bench
environment has very few cores (often 1) and the ~45 MB host->device
copy rides the axon relay, which serializes transfers with compute
(PERF.md) — both are reported, with the extrapolation made explicit.
"""
import json
import os
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
from endoscopydepthestimation_pytorch_tpu import training  # noqa: E402
from endoscopydepthestimation_pytorch_tpu.data import readers  # noqa: E402
from endoscopydepthestimation_pytorch_tpu.data.augment import (  # noqa: E402
    TrainingAugmentation)
from endoscopydepthestimation_pytorch_tpu.data.dataset import (  # noqa: E402
    BatchLoader, SfMDataset)
from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57  # noqa: E402

DATA_ROOT = Path("/root/reference/example_training_data_root")
BATCH, H, W, STEPS = 8, 256, 320, 20
_ARRAYS = ("color_1", "color_2", "sparse_depth_1", "sparse_depth_2",
           "depth_mask_1", "depth_mask_2", "flow_1", "flow_2",
           "flow_mask_1", "flow_mask_2", "boundary", "rotation_1_wrt_2",
           "rotation_2_wrt_1", "translation_1_wrt_2", "translation_2_wrt_1",
           "intrinsic")


def device_batch(b):
    return {k: jax.device_put(jnp.asarray(b[k])) for k in _ARRAYS}


def main():
    train_files, _, _ = readers.get_color_file_names_by_bag(
        DATA_ROOT, ["1"], ["1"], ["1"])
    folders = readers.get_parent_folder_names(DATA_ROOT, [1, 2])
    dataset = SfMDataset(
        image_file_names=train_files, folder_list=folders,
        adjacent_range=[5, 30], transform=TrainingAugmentation(seed=10085),
        downsampling=4.0, network_downsampling=64, inlier_percentage=0.99,
        visible_interval=30, use_store_data=True, store_data_root=DATA_ROOT,
        phase="train", is_hsv=False, num_pre_workers=4, rgb_mode="rgb",
        num_iter=STEPS * BATCH)
    cores = os.cpu_count() or 1
    loader = BatchLoader(dataset, BATCH, shuffle=True,
                         num_workers=min(4, cores), seed=10085)

    # 1a. single-threaded per-sample pipeline cost
    import random as _random
    srng, arng = _random.Random(0), np.random.RandomState(0)
    dataset.get(0, srng, arng)  # warm caches
    t0 = time.perf_counter()
    for i in range(24):
        dataset.get(i % 16, srng, arng)
    per_sample_ms = (time.perf_counter() - t0) / 24 * 1e3

    # 1b. end-to-end loader rate on this host
    t0 = time.perf_counter()
    n = 0
    host_batches = []
    for b in loader:
        n += 1
        if len(host_batches) < 2:
            host_batches.append(b)
    host_rate = n / (time.perf_counter() - t0)

    # device step setup
    model = FCDenseNet57(n_classes=1, dtype=jnp.bfloat16)
    config = training.TrainConfig(lr_step_size=1000)
    state = training.create_train_state(model, jax.random.PRNGKey(0),
                                        (1, H, W, 3), config)
    step_fn = training.make_jit_train_step(config)
    dclw = jax.device_put(jnp.asarray(5.0, jnp.float32))
    staged = device_batch(host_batches[0])
    for _ in range(3):
        state, m = step_fn(state, staged, dclw)
    float(m["loss"])

    # 2. pre-staged step rate
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step_fn(state, staged, dclw)
    float(m["loss"])
    staged_ms = (time.perf_counter() - t0) / STEPS * 1e3

    # 3. live-loader step rate
    loader.set_epoch(1)
    t0 = time.perf_counter()
    n = 0
    for b in loader:
        state, m = step_fn(state, device_batch(b), dclw)
        n += 1
    float(m["loss"])
    live_ms = (time.perf_counter() - t0) / n * 1e3

    headroom = host_rate * staged_ms / 1e3  # batches produced per step time
    # cores needed so the threaded loader outpaces the device, and the
    # headroom a typical TPU-v5e host (>= 100 vCPU) would have
    device_sps = BATCH / (staged_ms / 1e3)
    sps_per_core = 1e3 / per_sample_ms
    cores_needed = device_sps / sps_per_core
    print(json.dumps({
        "host_cores": cores,
        "per_sample_ms_singlethread": round(per_sample_ms, 1),
        "host_loader_batches_per_sec": round(host_rate, 2),
        "prestaged_step_ms": round(staged_ms, 1),
        "live_loader_step_ms": round(live_ms, 1),
        "loader_headroom_x_this_host": round(headroom, 2),
        "cores_to_saturate_device": round(cores_needed, 1),
        "headroom_x_on_100_core_host": round(100 / cores_needed, 1),
        "note": "live-vs-prestaged gap in this env is the axon relay "
                "serializing the 45MB host->device copy with compute; "
                "per-sample work is thread-parallel on a real host",
    }))


if __name__ == "__main__":
    main()
