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
