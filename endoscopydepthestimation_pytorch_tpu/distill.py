"""Teacher-student distillation (the reference's dormant L6 path).

The paper's full method warm-starts a student network from a teacher using
a scale-invariant log loss; the reference keeps the machinery in
utils.py:1462-1482 (``learn_from_teacher``) plus best-model selection in
utils.py:1546-1612. Here the distillation step is one fused jitted
program: teacher forward (stop-gradient), student forward + backward,
clipped SGD update.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from . import losses
from .training import TrainState, TrainConfig


def distill_loss(student_apply, teacher_apply, student_vars, teacher_vars,
                 colors_1, colors_2, boundaries):
    """0.5 * (SI(student1, teacher1) + SI(student2, teacher2)).

    Parity: reference utils.py:1462-1482 — both depth sets passed through
    abs (a no-op for our abs-headed models, kept for correctness with
    other heads), teacher treated as ground truth.
    """
    colors = jnp.concatenate([colors_1, colors_2], axis=0)
    colors = colors * jnp.concatenate([boundaries, boundaries], axis=0)
    goal = jax.lax.stop_gradient(
        jnp.abs(teacher_apply(teacher_vars, colors, train=False)))
    pred = jnp.abs(student_apply(student_vars, colors, train=True,
                                 mutable=["batch_stats"])[0])
    g1, g2 = jnp.split(goal, 2, axis=0)
    p1, p2 = jnp.split(pred, 2, axis=0)
    return 0.5 * (losses.scale_invariant_loss(p1, g1, boundaries) +
                  losses.scale_invariant_loss(p2, g2, boundaries))


def distill_step(student: TrainState, teacher: TrainState,
                 batch: Dict[str, jnp.ndarray], config: TrainConfig
                 ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One student update toward the (frozen) teacher's depth."""
    teacher_vars = {"params": teacher.params, "batch_stats": teacher.batch_stats}

    def loss_fn(params):
        colors = jnp.concatenate([batch["color_1"], batch["color_2"]], axis=0)
        colors = colors * jnp.concatenate([batch["boundary"], batch["boundary"]], axis=0)
        goal = jax.lax.stop_gradient(
            jnp.abs(teacher.apply_fn(teacher_vars, colors, train=False)))
        student_vars = {"params": params, "batch_stats": student.batch_stats}
        pred, mutated = student.apply_fn(student_vars, colors, train=True,
                                         mutable=["batch_stats"])
        pred = jnp.abs(pred)
        g1, g2 = jnp.split(goal, 2, axis=0)
        p1, p2 = jnp.split(pred, 2, axis=0)
        loss = 0.5 * (losses.scale_invariant_loss(p1, g1, batch["boundary"]) +
                      losses.scale_invariant_loss(p2, g2, batch["boundary"]))
        return loss, mutated["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(student.params)
    finite = jnp.isfinite(loss)
    grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.full_like(g, jnp.nan)), grads)
    updates, new_opt_state = student.tx.update(grads, student.opt_state, student.params)
    new_params = optax.apply_updates(student.params, updates)
    new_student = student.replace(step=student.step + finite.astype(jnp.int32),
                                  params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt_state)
    return new_student, {"loss": loss, "finite": finite.astype(jnp.float32)}


def make_jit_distill_step(config: TrainConfig):
    return jax.jit(partial(distill_step, config=config), donate_argnums=0)
