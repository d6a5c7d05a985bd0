"""End-to-end check of the native C++ PJRT serving host on real hardware.

Flow (this process stays on the CPU backend so it never claims the TPU;
the C++ host is the only TPU client):

1. Build a DepthPredictor over the bag_1 fixture sequence (fresh
   checkpoint, bf16 + packed — the shipped 256x320 serving config).
2. Export the PJRT bundle (platform=tpu) and a real input batch.
3. Compute the CPU-jax reference prediction for the same batch.
4. Build and run native/pjrt_host against the PJRT plugin (default:
   the axon relay plugin on this box; on a TPU VM pass libtpu.so).
5. Compare outputs and report the host's measured serving latency.

Usage: python scripts/serve_pjrt_e2e.py [--plugin /opt/axon/libaxon_pjrt.so]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import uuid
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from endoscopydepthestimation_pytorch_tpu import serving, training  # noqa: E402
from endoscopydepthestimation_pytorch_tpu.data import preprocess  # noqa: E402
from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57  # noqa: E402
from endoscopydepthestimation_pytorch_tpu.utils import checkpoint as ckpt  # noqa: E402

FIXTURE = Path("/root/reference/example_training_data_root/bag_1/"
               "_start_004259_end_004629_stride_25_segment_13")

# create-options the axon relay plugin needs on this box; a real TPU VM's
# libtpu.so needs none of these (pass --plugin .../libtpu.so and no options)
AXON_OPTIONS = [
    "remote_compile=i:1", "local_only=i:0", "priority=i:0",
    "topology=s:v5e:1x1x1", "n_slices=i:1", f"session_id=s:{uuid.uuid4()}",
    "rank=i:4294967295",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plugin", default="/opt/axon/libaxon_pjrt.so")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--record", default=None,
                    help="merge the measured serving numbers into this JSON "
                         "file (bench.py reads BENCH_native_serving.json "
                         "into its enriched line as native_* fields)")
    ap.add_argument("--stream_batches", type=int, default=2,
                    help="batches through the --stream leg (>=2; more makes "
                         "its ms/batch a real latency measurement)")
    ap.add_argument("--downsampling", type=float, default=4.0,
                    help="frame downsampling (reference --input_downsampling;"
                         " 2.0 gives the real 512x576 bag_1 crop)")
    ap.add_argument("--suggested_size", type=int, nargs=2, default=[256, 320],
                    metavar=("H", "W"), help="crop-size hint; the dataset "
                    "computes the actual 64-divisible crop from the mask")
    args = ap.parse_args()

    seq = preprocess.preprocess_sequence(
        FIXTURE, downsampling=args.downsampling, network_downsampling=64,
        is_hsv=False, inlier_percentage=0.99, visible_interval=30,
        suggested_h=args.suggested_size[0], suggested_w=args.suggested_size[1])

    h, w = seq.mask_boundary.shape[:2]
    print(f"sequence crop: {h}x{w}", file=sys.stderr)
    work = Path(tempfile.mkdtemp(prefix="pjrt_e2e_"))
    model = FCDenseNet57(n_classes=1)
    config = training.TrainConfig()
    state = training.create_train_state(
        model, jax.random.PRNGKey(7), (1, h, w, 3), config)
    ckpt.save_checkpoint(work / "ckpt", state, epoch=0, validation_loss=1.0)

    predictor = serving.DepthPredictor(work / "ckpt", seq,
                                       batch_size=args.batch,
                                       downsampling=args.downsampling)
    bundle = work / "bundle"
    predictor.export_pjrt_bundle(bundle, platform="tpu")

    frames = sorted(FIXTURE.glob("0*.jpg"))[:args.batch]
    colors = np.stack([predictor.prepare(f) for f in frames])
    colors.astype(np.float32).tofile(work / "input.bin")
    reference = predictor.predict_batch(colors)  # CPU jax, bf16 model

    host = serving.build_pjrt_host()
    cmd = [str(host), "--plugin", args.plugin, "--bundle", str(bundle),
           "--input", str(work / "input.bin"),
           "--output", str(work / "depth.bin"), "--iters", str(args.iters)]
    for opt in (AXON_OPTIONS if "axon" in args.plugin else []):
        cmd += ["--option", opt]
    print("+", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=900)
    sys.stderr.write(proc.stderr)
    print(proc.stdout, flush=True)
    if proc.returncode != 0:
        sys.exit(f"pjrt_host failed rc={proc.returncode}")

    got = np.fromfile(work / "depth.bin", np.float32).reshape(
        args.batch, h, w)
    ref = np.asarray(reference, np.float32)
    # bf16 model on two backends: expect ~0.3% mean-relative rounding noise
    # and near-perfect correlation; structural bugs (layout, wrong weights)
    # land orders of magnitude outside both (the round-4 d2h-layout bug
    # measured corr 0.29 / mean-rel 0.76)
    scale = np.abs(ref).mean() or 1.0
    mean_rel = np.abs(got - ref).mean() / scale
    corr = float(np.corrcoef(got.ravel(), ref.ravel())[0, 1])
    ok = mean_rel < 0.02 and corr > 0.999
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    print(json.dumps({
        "host_ms_per_batch": line["value"], "host_fps": line["fps"],
        "compile_ms": line["compile_ms"],
        "mean_rel_diff": float(mean_rel), "corr": corr,
        "parity": "OK" if ok else "FAIL",
    }))
    if not ok:
        sys.exit("parity FAIL: TPU host output deviates from CPU reference")
    if args.record:
        rec = {}
        if os.path.exists(args.record):
            with open(args.record) as f:
                rec = json.load(f)
        rec[f"serving_b{args.batch}_ms"] = line["value"]
        rec[f"serving_b{args.batch}_fps"] = line["fps"]
        with open(args.record, "w") as f:
            json.dump(rec, f)
        print(f"recorded -> {args.record}", file=sys.stderr)

    # --stream leg: alternating (original, batch-flipped) batches through
    # the double-buffered stdin/stdout pipeline; per-sample determinism
    # means even batches must be BIT-identical to the one-shot output
    n_stream = max(2, args.stream_batches)
    frames2 = np.concatenate(
        [colors if i % 2 == 0 else colors[::-1]
         for i in range(n_stream)]).astype(np.float32)
    frames2.tofile(work / "stream_in.bin")
    cmd2 = [str(host), "--plugin", args.plugin, "--bundle", str(bundle),
            "--stream"]
    for opt in (AXON_OPTIONS if "axon" in args.plugin else []):
        cmd2 += ["--option", opt]
    print("+", " ".join(cmd2), "< stream_in.bin", flush=True)
    with open(work / "stream_in.bin", "rb") as fin, \
            open(work / "stream_out.bin", "wb") as fout:
        proc2 = subprocess.run(cmd2, stdin=fin, stdout=fout,
                               stderr=subprocess.PIPE, text=False,
                               timeout=900)
    stderr2 = proc2.stderr.decode()
    sys.stderr.write(stderr2)
    if proc2.returncode != 0:
        sys.exit(f"pjrt_host --stream failed rc={proc2.returncode}")
    streamed = np.fromfile(work / "stream_out.bin", np.float32).reshape(
        n_stream, args.batch, h, w)
    for i in range(n_stream):
        expect = got if i % 2 == 0 else got[::-1]
        assert np.array_equal(streamed[i], expect), f"stream batch{i} mismatch"
    stream_ms = None
    for ln in stderr2.splitlines():
        if '"pjrt_host_stream"' in ln:
            stream_ms = json.loads(ln)["ms_per_batch"]
    print(json.dumps({"stream": "OK", "stream_batches": n_stream,
                      "stream_ms_per_batch": stream_ms}))
    if args.record and stream_ms is not None:
        with open(args.record) as f:
            rec = json.load(f)
        rec[f"serving_b{args.batch}_stream_ms"] = round(stream_ms, 3)
        with open(args.record, "w") as f:
            json.dump(rec, f)


if __name__ == "__main__":
    main()
