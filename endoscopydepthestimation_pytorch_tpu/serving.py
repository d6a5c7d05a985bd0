"""Streaming depth inference for deployment (video-rate serving).

The reference's test phase re-runs a full evaluation script per sequence
(evaluate.py:279-346). For serving, this module wraps a trained model
(ours or a reference torch checkpoint) behind a double-buffered pipeline:
host threads decode/normalize frame t+1 while the TPU runs frame t, and
results are read back one step late so the device never waits on the host.
"""
from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import training
from .data import preprocess
from .data.augment import normalize_color
from .models import FCDenseNet57
from .utils import checkpoint as ckpt


def build_pjrt_host(force: bool = False) -> Path:
    """Compile the native serving host (``native/pjrt_host.cpp``), cached
    next to the source like the native rasterizer. Returns the binary path.
    """
    import subprocess
    native_dir = Path(__file__).resolve().parents[1] / "native"
    src, binary = native_dir / "pjrt_host.cpp", native_dir / "pjrt_host"
    if force or not binary.exists() or (
            binary.stat().st_mtime < src.stat().st_mtime):
        subprocess.run(
            ["g++", "-std=c++17", "-O2", "-o", str(binary), str(src), "-ldl"],
            check=True, capture_output=True, cwd=native_dir)
    return binary


def load_exported(path):
    """Load an artifact written by :meth:`DepthPredictor.export`.

    Returns a jitted ``fn(colors) -> depth`` — ``(B, H, W, 3) float32``
    normalized colors to ``(B, H, W, 1)`` boundary-masked depth. This is
    the entire deployment-side dependency surface: jax + the artifact
    bytes; no model definition, flax, orbax, or torch.
    """
    exported = jax.export.deserialize(Path(path).read_bytes())
    return jax.jit(exported.call)


class DepthPredictor:
    """Checkpoint-backed depth inference on one sequence's calibration.

    ``sequence`` supplies the crop box / boundary mask / intrinsics (a
    ``SequenceData`` from preprocessing or a precompute cache).
    """

    def __init__(self, checkpoint_path, sequence: preprocess.SequenceData,
                 batch_size: int = 1, downsampling: float = 4.0,
                 dtype=jnp.bfloat16, packed=None):
        self.sequence = sequence
        self.batch_size = batch_size
        self.downsampling = downsampling
        sh, eh, sw, ew = sequence.crop_positions
        self.height, self.width = eh - sh, ew - sw

        if packed is None:
            # measured on v5e: shifted-weight packing wins at 256x320
            # (181 vs 127 fps) but loses at 512x640 (44.7 vs 48.9 fps) —
            # the strided-conv layout transforms outgrow the MXU-lane
            # gain with pixel count (PERF.md round 2)
            packed = self.height * self.width <= 160_000
        model = FCDenseNet57(n_classes=1, dtype=dtype, packed=packed)
        config = training.TrainConfig(compute_dtype=dtype)
        state = training.create_train_state(
            model, jax.random.PRNGKey(0), (1, self.height, self.width, 3), config)
        self.state, _, _ = ckpt.load_any_checkpoint(checkpoint_path, state)

        boundary = (sequence.mask_boundary.astype(np.float32) / 255.0 > 0.9)
        boundary = boundary.astype(np.float32)[None, :, :, None]
        self._boundary = jnp.asarray(np.repeat(boundary, batch_size, axis=0))
        self._predict = jax.jit(training.predict_step)

    # -- host-side frame prep ------------------------------------------------

    def prepare(self, frame) -> np.ndarray:
        """Path or raw BGR frame -> normalized cropped float32 (H, W, 3)."""
        if isinstance(frame, (str, Path)):
            sh, eh, sw, ew = self.sequence.crop_positions
            img = preprocess.load_color_image(frame, sh, eh, sw, ew,
                                              self.downsampling, is_hsv=False,
                                              rgb_mode="rgb")
        else:
            import cv2
            sh, eh, sw, ew = self.sequence.crop_positions
            img = cv2.resize(np.asarray(frame), (0, 0),
                             fx=1.0 / self.downsampling, fy=1.0 / self.downsampling)
            img = cv2.cvtColor(img[sh:eh, sw:ew], cv2.COLOR_BGR2RGB)
        return normalize_color(img)

    # -- inference -----------------------------------------------------------

    def predict_batch(self, colors: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) normalized colors -> (B, H, W) masked depth."""
        depth = self._predict(self.state, jnp.asarray(colors), self._boundary)
        return np.asarray(depth * self._boundary)[..., 0]

    def predict_frame(self, frame) -> np.ndarray:
        colors = np.repeat(self.prepare(frame)[None], self.batch_size, axis=0)
        return self.predict_batch(colors)[0]

    # -- AOT deployment artifact ---------------------------------------------

    def export(self, path) -> None:
        """Serialize this predictor as a standalone AOT artifact.

        Uses ``jax.export`` to lower the jitted predict step — with the
        trained parameters, running BN statistics, and the sequence's
        boundary mask baked in as constants — to versioned StableHLO,
        exported for BOTH the ``tpu`` and ``cpu`` platforms. The artifact
        is a single file a serving host loads with :func:`load_exported`
        (or ``jax.export.deserialize`` directly) with NO model code, flax,
        or checkpoint machinery on the deployment side.

        The batch dimension is fixed at ``self.batch_size``: depth serving
        is a fixed-rate video pipeline, and static shapes keep the convs on
        XLA's tiled MXU path (a symbolic batch would force re-tiling
        decisions at run time). Input spec: ``(batch, H, W, 3) float32``
        normalized colors; output: ``(batch, H, W, 1)`` masked depth in the
        model's compute dtype.
        """
        state, boundary = self.state, self._boundary

        def predict(colors):
            return training.predict_step(state, colors, boundary) * boundary

        spec = jax.ShapeDtypeStruct(
            (self.batch_size, self.height, self.width, 3), jnp.float32)
        exported = jax.export.export(
            jax.jit(predict), platforms=("tpu", "cpu"))(spec)
        Path(path).write_bytes(exported.serialize())

    def export_pjrt_bundle(self, bundle_dir, platform: str = "tpu") -> None:
        """Write a deployment bundle for the native C++ PJRT host.

        Unlike :meth:`export` (a jax-consumable artifact), this targets
        ``native/pjrt_host.cpp`` — a Python-free serving host that talks
        straight to a PJRT plugin (libtpu.so on a TPU VM). Layout::

            module.mlirbc       StableHLO portable artifact, single
                                platform (multi-platform modules take a
                                platform-index argument the C host would
                                have to thread through)
            compile_options.pb  serialized xla CompileOptionsProto
                                (1 replica, 1 partition), produced here so
                                the host needs no protobuf dependency
            meta.txt            key=value input/output specs parsed by the
                                host (shapes, dtypes)

        The exported function casts the depth output to float32 so
        consumers never see bf16 on the host side.
        """
        from jax._src.lib import xla_client

        state, boundary = self.state, self._boundary

        def predict(colors):
            depth = training.predict_step(state, colors, boundary) * boundary
            return depth.astype(jnp.float32)

        spec = jax.ShapeDtypeStruct(
            (self.batch_size, self.height, self.width, 3), jnp.float32)
        exported = jax.export.export(
            jax.jit(predict), platforms=(platform,))(spec)

        bundle = Path(bundle_dir)
        bundle.mkdir(parents=True, exist_ok=True)
        (bundle / "module.mlirbc").write_bytes(exported.mlir_module_serialized)
        (bundle / "compile_options.pb").write_bytes(
            xla_client.CompileOptions().SerializeAsString())

        def fmt(aval):
            shape = ",".join(str(d) for d in aval.shape)
            return shape, np.dtype(aval.dtype).name
        lines = [f"platform={platform}"]
        for i, aval in enumerate(exported.in_avals):
            shape, dtype = fmt(aval)
            lines += [f"input{i}_shape={shape}", f"input{i}_dtype={dtype}"]
        for i, aval in enumerate(exported.out_avals):
            shape, dtype = fmt(aval)
            lines += [f"output{i}_shape={shape}", f"output{i}_dtype={dtype}"]
        (bundle / "meta.txt").write_text("\n".join(lines) + "\n")

    def stream(self, frames: Iterable, prefetch: int = 2
               ) -> Iterator[Tuple[int, np.ndarray]]:
        """Double-buffered streaming: yields (frame_index, depth (H, W)).

        Host prep runs on a producer thread; device dispatch stays one
        batch ahead of readback.
        """
        q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch) * self.batch_size)

        def produce():
            for i, frame in enumerate(frames):
                q.put((i, self.prepare(frame)))
            q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()

        pending: Optional[Tuple[list, jnp.ndarray]] = None
        done = False
        while not done or pending is not None:
            batch_ids, batch_colors = [], []
            while not done and len(batch_ids) < self.batch_size:
                item = q.get()
                if item is None:
                    done = True
                    break
                batch_ids.append(item[0])
                batch_colors.append(item[1])

            dispatched = None
            if batch_ids:
                colors = np.stack(batch_colors)
                if colors.shape[0] < self.batch_size:  # ragged tail: pad
                    pad = np.repeat(colors[-1:], self.batch_size - colors.shape[0], 0)
                    colors = np.concatenate([colors, pad])
                depth = self._predict(self.state, jnp.asarray(colors), self._boundary)
                dispatched = (batch_ids, depth)

            if pending is not None:
                ids, device_depth = pending
                host = np.asarray(device_depth * self._boundary)[..., 0]
                for k, frame_id in enumerate(ids):
                    yield frame_id, host[k]
            pending = dispatched
