"""TPU-native self-supervised endoscopy depth estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``lppllppl920/EndoscopyDepthEstimation-Pytorch``: dense monocular depth from
endoscopic video, supervised only by Structure-from-Motion byproducts
(sparse points, camera poses, per-point visibility).

Layering (mirrors SURVEY.md):
  data/      SfM data model, readers, preprocessing, sparse-label rasterizer,
             host batch pipeline (L0-L2)
  models/    FCDenseNet 57/67/103 + UNet in Flax, NHWC, TPU-friendly (L3a)
  ops/       differentiable geometry: scale recovery, flow-from-depth,
             depth warping, bilinear grid sampling (jnp reference + Pallas) (L3b)
  losses.py  SFL / DCL and the full loss & metric suite (L3c)
  schedule.py cyclic triangular LR as a pure function of step (L3d)
  parallel/  1-D data mesh, sharded train/eval steps via jit+shardings
  utils/     point-cloud export, visualization, checkpointing, logging (L5)
"""

__version__ = "0.1.0"

from . import losses, schedule  # noqa: E402,F401
from .training import (TrainConfig, TrainState, create_train_state,  # noqa: E402,F401
                       dcl_weight_for_epoch, make_jit_eval_step,
                       make_jit_train_step, predict_step)
