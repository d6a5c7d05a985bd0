"""End-to-end jitted training/validation steps (layer L4 core).

One ``train_step`` fuses: both model forwards (the frame pair is stacked
into a single 2B batch for one MXU-friendly forward), scale recovery,
flow-from-depth, depth warping, SFL + DCL, cyclic-LR SGD with global-norm
clipping, and the non-finite-loss guard — a single XLA program with no
host round-trips (the reference runs this as ~10 separate CUDA launches
per iteration, train.py:244-328).

Non-finite handling: the reference skips the optimizer step when the loss
is NaN/Inf but still runs the forward (so BN running stats advance) and
does not advance the global step (train.py:317-322, 339). We reproduce
that exactly with ``optax.apply_if_finite`` + an explicit loss-finiteness
gate — all inside jit via ``jnp.where`` selects, no host sync.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from . import losses
from .ops import geometry
from .schedule import make_cyclic_schedule


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters of the self-supervised objective.

    Defaults mirror the reference CLI (train.py:42-57).
    """
    sfl_weight: float = 20.0
    dcl_weight: float = 5.0
    dcl_warmup_weight: float = 0.1      # epochs <= dcl_warmup_epochs
    dcl_warmup_epochs: int = 20         # reference train.py:239-242
    max_lr: float = 1.0e-3
    min_lr: float = 1.0e-4
    lr_step_size: int = 1000            # half-cycle = num_iter (train.py:203)
    momentum: float = 0.9
    grad_clip_norm: float = 10.0        # reference train.py:327
    zero_division_epsilon: float = 1.0e-8
    compute_dtype: Any = jnp.float32    # set bfloat16 for TPU-native speed


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Any = struct.field(pytree_node=False)
    tx: Any = struct.field(pytree_node=False)


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """clip-by-global-norm(10) -> SGD(momentum 0.9, cyclic LR), with
    non-finite-gradient step skipping (matching the reference's NaN guard,
    train.py:317-328; torch SGD's buf = m*buf + g; p -= lr*buf equals
    optax's trace + scale_by_learning_rate)."""
    schedule = make_cyclic_schedule(config.min_lr, config.max_lr, config.lr_step_size)
    inner = optax.chain(
        optax.clip_by_global_norm(config.grad_clip_norm),
        optax.sgd(learning_rate=schedule, momentum=config.momentum),
    )
    return optax.apply_if_finite(inner, max_consecutive_errors=10 ** 8)


def create_train_state(model, rng, input_shape: Tuple[int, ...],
                       config: TrainConfig) -> TrainState:
    """Initialize parameters/batch-stats (Kaiming init happens inside the
    model definition) and the optimizer state."""
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros(input_shape, jnp.float32), train=False)
    )(rng)
    tx = make_optimizer(config)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        # models without normalization layers (UNet) have no batch_stats
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        apply_fn=model.apply,
        tx=tx)


def _forward_pair(apply_fn, params, batch_stats, batch, train: bool):
    """Single fused forward over both frames: stack to (2B, H, W, 3).

    The reference runs two separate forwards (train.py:276-277); stacking
    doubles the matmul batch for the MXU and halves kernel launches. Note
    train-mode BN then normalizes over both frames jointly — documented
    deviation from DataParallel's per-replica/per-frame stats.
    """
    boundaries = batch["boundary"]
    colors = jnp.concatenate([batch["color_1"], batch["color_2"]], axis=0)
    colors = colors * jnp.concatenate([boundaries, boundaries], axis=0)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        depths, mutated = apply_fn(variables, colors, train=True,
                                   mutable=["batch_stats"])
        new_stats = mutated.get("batch_stats", {})
    else:
        depths = apply_fn(variables, colors, train=False)
        new_stats = batch_stats
    d1, d2 = jnp.split(depths, 2, axis=0)
    return d1, d2, new_stats


def compute_losses(d1, d2, batch, sfl_weight, dcl_weight, epsilon: float):
    """The self-supervised objective given the two raw depth predictions.

    Mirrors the reference iteration body (train.py:279-315): scale
    recovery, flow-from-depth vs sparse flow (SFL), bidirectional depth
    warping vs prediction (DCL). Both warp directions are STACKED into
    single batch-2B geometry calls — the per-sample reductions make the
    batch mean over the stack exactly 0.5 * (dir1 + dir2), so this is the
    identical objective with half the kernel launches.
    """
    boundaries = batch["boundary"]
    intrinsics = batch["intrinsic"]

    def stack(a, b):
        return jnp.concatenate([a, b], axis=0)

    bound2 = stack(boundaries, boundaries)
    k2 = stack(intrinsics, intrinsics)
    t_fwd = stack(batch["translation_1_wrt_2"], batch["translation_2_wrt_1"])
    r_fwd = stack(batch["rotation_1_wrt_2"], batch["rotation_2_wrt_1"])

    scaled, stds_vec, scales_vec = geometry.scale_recovery_per_sample(
        stack(d1, d2),
        stack(batch["sparse_depth_1"], batch["sparse_depth_2"]),
        stack(batch["depth_mask_1"], batch["depth_mask_2"]), epsilon)
    scaled_1, scaled_2 = jnp.split(scaled, 2, axis=0)
    # per-frame diagnostics: the reference calls DepthScalingLayer once per
    # frame over B samples (train.py:279-282 there), so each frame's
    # normalized std is the cross-batch formula over its own half
    stds_1v, stds_2v = jnp.split(stds_vec, 2, axis=0)
    scales_1v, scales_2v = jnp.split(scales_vec, 2, axis=0)
    std_1 = geometry.normalized_scale_std(stds_1v, scales_1v)
    std_2 = geometry.normalized_scale_std(stds_2v, scales_2v)

    flows_from_depth = geometry.flow_from_depth(
        scaled, bound2, t_fwd, r_fwd, k2) * bound2
    flows_from_depth_1, flows_from_depth_2 = jnp.split(flows_from_depth, 2, axis=0)

    sfl = sfl_weight * losses.sparse_masked_l1_loss(
        stack(batch["flow_1"], batch["flow_2"]) * bound2,
        flows_from_depth,
        stack(batch["flow_mask_1"], batch["flow_mask_2"]) * bound2)

    scaled_swap = stack(scaled_2, scaled_1)
    warped, intersect = geometry.warp_depth(
        scaled, scaled_swap, bound2, t_fwd, r_fwd, k2, epsilon)
    warped_2_to_1, warped_1_to_2 = jnp.split(warped, 2, axis=0)
    intersect_1, intersect_2 = jnp.split(intersect, 2, axis=0)

    dcl = dcl_weight * losses.normalized_distance_loss(scaled, warped, intersect, k2)

    aux = {
        "sparse_flow_loss": sfl,
        "depth_consistency_loss": dcl,
        "scale_std_1": std_1,
        "scale_std_2": std_2,
        "scaled_depth_1": scaled_1,
        "scaled_depth_2": scaled_2,
        "flows_from_depth_1": flows_from_depth_1,
        "flows_from_depth_2": flows_from_depth_2,
        "warped_depth_2_to_1": warped_2_to_1,
        "warped_depth_1_to_2": warped_1_to_2,
        "intersect_masks_1": intersect_1,
        "intersect_masks_2": intersect_2,
    }
    return sfl + dcl, aux


def apply_gradients(state: TrainState, loss, grads, new_stats, scalars
                    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Shared post-gradient logic of the jit and shard_map train steps.

    Loss-finiteness gate on top of optax's gradient gate: poison the grads
    when the loss is non-finite so apply_if_finite's inner state (momentum,
    schedule count) is untouched — the reference neither updates params
    nor advances the step counter in that case (train.py:317-322, 339).
    """
    finite = jnp.isfinite(loss)
    grads = jax.tree.map(
        lambda g: jnp.where(finite, g, jnp.full_like(g, jnp.nan)), grads)
    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    new_state = state.replace(
        step=state.step + finite.astype(jnp.int32),
        params=new_params,
        batch_stats=new_stats,  # BN stats advance even on skipped steps
        opt_state=new_opt_state)

    metrics = {
        "loss": loss,
        "sparse_flow_loss": scalars["sparse_flow_loss"],
        "depth_consistency_loss": scalars["depth_consistency_loss"],
        "scale_std": 0.5 * (scalars["scale_std_1"] + scalars["scale_std_2"]),
        "finite": finite.astype(jnp.float32),
        "grad_norm": optax.global_norm(grads),
    }
    return new_state, metrics


_IMAGE_KEYS = ("scaled_depth_1", "flows_from_depth_1",
               "scaled_depth_2", "flows_from_depth_2")


def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
               dcl_weight: jnp.ndarray, config: TrainConfig,
               with_images: bool = False, grad_accum: int = 1
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One fully-fused optimization step. ``dcl_weight`` is a traced scalar
    so the warmup switch (train.py:239-242) never recompiles.

    ``with_images=True`` additionally returns both frames' scaled depths
    and dense flows for the reference's per-``display_interval`` 8-row
    training board (c1,d1,sf1,df1,c2,d2,sf2,df2 — train.py:353-371 there).
    It is a separate compiled program — non-display steps pay nothing for
    it.

    ``grad_accum=N`` splits the batch into N microbatches (row-strided, so
    each device of a data mesh contributes to every microbatch), runs the
    forward+backward per microbatch under ``lax.scan`` (one microbatch's
    activations live at a time), and applies ONE clipped SGD update on the
    mean gradient — the capacity lever for the reference's canonical batch
    8 at 512x640 on 16G HBM (its README.md:52; per-chip direct batch caps
    at 4 there, PERF.md). BN semantics, documented: each microbatch
    normalizes with its OWN batch statistics and running stats advance N
    times per step — exactly the BN behavior of N consecutive reference
    iterations at the microbatch size, not of one batch-8N iteration.
    Models without BN (UNet) produce bit-identical gradients to the
    unaccumulated step.
    """
    eps = config.zero_division_epsilon

    def loss_fn(params, batch_stats, mbatch):
        d1, d2, new_stats = _forward_pair(state.apply_fn, params,
                                          batch_stats, mbatch, train=True)
        loss, aux = compute_losses(d1, d2, mbatch, config.sfl_weight,
                                   dcl_weight, eps)
        return loss, (new_stats, aux)

    if grad_accum <= 1:
        (loss, (new_stats, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        new_state, metrics = apply_gradients(state, loss, grads, new_stats, aux)
        if with_images:
            metrics = dict(metrics, **{k: aux[k] for k in _IMAGE_KEYS})
        return new_state, metrics

    n = grad_accum
    batch_size = batch["color_1"].shape[0]
    if batch_size % n:
        raise ValueError(f"batch {batch_size} not divisible by grad_accum {n}")
    scalar_keys = ("sparse_flow_loss", "depth_consistency_loss",
                   "scale_std_1", "scale_std_2")

    def to_micro(x):
        # row-strided split: microbatch m = rows [m::n], so a contiguously
        # batch-sharded array keeps every device busy in every microbatch
        return jnp.swapaxes(
            x.reshape(batch_size // n, n, *x.shape[1:]), 0, 1)

    micro_batches = jax.tree.map(to_micro, batch)

    def body(carry, mbatch):
        stats, grad_sum, loss_sum, scalar_sum = carry
        (loss, (new_stats, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, stats, mbatch)
        grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
        scalar_sum = {k: scalar_sum[k] + aux[k] for k in scalar_keys}
        images = {k: aux[k] for k in _IMAGE_KEYS} if with_images else {}
        return (new_stats, grad_sum, loss_sum + loss, scalar_sum), images

    init = (state.batch_stats,
            jax.tree.map(jnp.zeros_like, state.params),
            jnp.zeros((), jnp.float32),
            {k: jnp.zeros((), jnp.float32) for k in scalar_keys})
    (new_stats, grad_sum, loss_sum, scalar_sum), images = jax.lax.scan(
        body, init, micro_batches)

    inv = 1.0 / n
    grads = jax.tree.map(lambda g: g * inv, grad_sum)
    loss = loss_sum * inv
    scalars = {k: v * inv for k, v in scalar_sum.items()}
    new_state, metrics = apply_gradients(state, loss, grads, new_stats, scalars)
    if with_images:
        # (n, B/n, H, W, C) scan stack -> original row order
        metrics = dict(metrics, **{
            k: jnp.swapaxes(v, 0, 1).reshape(batch_size, *v.shape[2:])
            for k, v in images.items()})
    return new_state, metrics


def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray],
              dcl_weight: jnp.ndarray, config: TrainConfig,
              with_images: bool = False,
              use_batch_stats: bool = False) -> Dict[str, jnp.ndarray]:
    """Validation step: same objective, no gradient.

    ``use_batch_stats=True`` reproduces the reference *training-loop*
    validation, which never flips the model out of train mode so BN uses
    batch statistics (train.py:234, 380 there); the default (running
    averages) matches its standalone evaluate.py, which does call .eval()
    (evaluate.py:164). Stats are never written back either way.
    """
    if use_batch_stats:
        d1, d2, _ = _forward_pair(state.apply_fn, state.params,
                                  state.batch_stats, batch, train=True)
    else:
        d1, d2, _ = _forward_pair(state.apply_fn, state.params,
                                  state.batch_stats, batch, train=False)
    loss, aux = compute_losses(d1, d2, batch, config.sfl_weight, dcl_weight,
                               config.zero_division_epsilon)
    metrics = {
        "loss": loss,
        "sparse_flow_loss": aux["sparse_flow_loss"],
        "depth_consistency_loss": aux["depth_consistency_loss"],
    }
    if with_images:
        metrics.update({k: aux[k] for k in
                        ("scaled_depth_1", "scaled_depth_2", "flows_from_depth_1",
                         "flows_from_depth_2", "warped_depth_2_to_1",
                         "warped_depth_1_to_2", "intersect_masks_1",
                         "intersect_masks_2")})
    return metrics


def predict_step(state: TrainState, colors: jnp.ndarray,
                 boundaries: jnp.ndarray) -> jnp.ndarray:
    """Test-phase depth inference: model(boundary * color) with running BN
    stats (reference evaluate.py:322-327)."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return state.apply_fn(variables, colors * boundaries, train=False)


def make_jit_train_step(config: TrainConfig, with_images: bool = False,
                        grad_accum: int = 1):
    """jit with donated state so XLA reuses parameter/optimizer buffers."""
    return jax.jit(partial(train_step, config=config, with_images=with_images,
                           grad_accum=grad_accum),
                   donate_argnums=0)


def make_jit_eval_step(config: TrainConfig, with_images: bool = False,
                       use_batch_stats: bool = False):
    return jax.jit(partial(eval_step, config=config, with_images=with_images,
                           use_batch_stats=use_batch_stats))


def dcl_weight_for_epoch(epoch: int, config: TrainConfig) -> float:
    """DCL warmup (reference train.py:239-242)."""
    return (config.dcl_warmup_weight if epoch <= config.dcl_warmup_epochs
            else config.dcl_weight)
