"""Train/eval step behavior: loss decreases on a fixed batch, NaN guard
skips updates, cyclic LR advances with successful steps only."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endoscopydepthestimation_pytorch_tpu import training
from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57


H, W, B = 64, 64, 2


def _synthetic_batch(seed=0, batch=B, h=H, w=W):
    """A geometrically-consistent synthetic batch: constant depth plane,
    small rotation-free translation, exact sparse flow from the geometry."""
    rng = np.random.RandomState(seed)
    k = np.zeros((batch, 3, 3), np.float32)
    k[:, 0, 0] = 80.0; k[:, 1, 1] = 80.0
    k[:, 0, 2] = w / 2; k[:, 1, 2] = h / 2; k[:, 2, 2] = 1.0
    rot = np.tile(np.eye(3, dtype=np.float32), (batch, 1, 1))
    t12 = np.zeros((batch, 3, 1), np.float32)
    t12[:, 2, 0] = 0.02  # small forward motion
    t21 = -t12

    depth_gt = 1.0
    mask = np.zeros((batch, h, w, 1), np.float32)
    mask[:, 8:-8, 8:-8] = 1.0
    sparse_mask = np.zeros((batch, h, w, 1), np.float32)
    sparse_mask[:, 12:-12:4, 12:-12:4] = 1.0
    sparse_depth = sparse_mask * depth_gt

    # flow for constant depth + pure z-translation (u2 = (u - cx)*d/(d - tz) + cx)
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    z2 = depth_gt - 0.02
    u2 = (xs - k[0, 0, 2]) * depth_gt / z2 + k[0, 0, 2]
    v2 = (ys - k[0, 1, 2]) * depth_gt / z2 + k[0, 1, 2]
    flow = np.stack([(u2 - xs) / w, (v2 - ys) / h], -1)[None].repeat(batch, 0).astype(np.float32)

    return {
        "color_1": rng.uniform(-1, 1, (batch, h, w, 3)).astype(np.float32),
        "color_2": rng.uniform(-1, 1, (batch, h, w, 3)).astype(np.float32),
        "sparse_depth_1": sparse_depth, "sparse_depth_2": sparse_depth,
        "depth_mask_1": sparse_mask, "depth_mask_2": sparse_mask,
        "flow_1": flow * sparse_mask, "flow_2": -flow * sparse_mask,
        "flow_mask_1": sparse_mask, "flow_mask_2": sparse_mask,
        "boundary": mask,
        "rotation_1_wrt_2": rot, "rotation_2_wrt_1": rot,
        "translation_1_wrt_2": t12, "translation_2_wrt_1": t21,
        "intrinsic": k,
    }


@pytest.fixture(scope="module")
def setup():
    config = training.TrainConfig(lr_step_size=50)
    model = FCDenseNet57(n_classes=1)
    state = training.create_train_state(model, jax.random.PRNGKey(0),
                                        (1, H, W, 3), config)
    # train_step donates its input state; hand every test a fresh copy so
    # the master fixture state is never consumed
    def fresh():
        return jax.tree.map(jnp.array, state)
    return config, model, fresh


def test_train_step_runs_and_learns(setup):
    config, model, fresh = setup
    state = fresh()
    step_fn = training.make_jit_train_step(config)
    batch = jax.tree.map(jnp.asarray, _synthetic_batch())
    dclw = jnp.asarray(0.1, jnp.float32)
    losses_seen = []
    for _ in range(8):
        state, metrics = step_fn(state, batch, dclw)
        losses_seen.append(float(metrics["loss"]))
    assert all(np.isfinite(losses_seen))
    assert losses_seen[-1] < losses_seen[0], losses_seen
    assert int(state.step) == 8
    assert float(metrics["finite"]) == 1.0


def test_nan_guard_skips_update(setup):
    config, model, fresh = setup
    state = fresh()
    step_fn = training.make_jit_train_step(config)
    batch = _synthetic_batch()
    # empty depth masks -> 0/0 in scale recovery -> NaN loss
    batch["depth_mask_1"] = np.zeros_like(batch["depth_mask_1"])
    batch["sparse_depth_1"] = np.zeros_like(batch["sparse_depth_1"])
    batch = jax.tree.map(jnp.asarray, batch)
    params_before = jax.tree.map(np.asarray, state.params)
    step_before = int(state.step)
    new_state, metrics = step_fn(state, batch, jnp.asarray(0.1))
    assert not np.isfinite(float(metrics["loss"]))
    assert float(metrics["finite"]) == 0.0
    assert int(new_state.step) == step_before  # step does not advance
    for a, b in zip(jax.tree.leaves(params_before),
                    jax.tree.leaves(jax.tree.map(np.asarray, new_state.params))):
        np.testing.assert_array_equal(a, b)  # params untouched


def test_eval_step_metrics(setup):
    config, model, fresh = setup
    state = fresh()
    eval_fn = training.make_jit_eval_step(config, with_images=True)
    batch = jax.tree.map(jnp.asarray, _synthetic_batch())
    metrics = eval_fn(state, batch, jnp.asarray(5.0))
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["scaled_depth_1"].shape == (B, H, W, 1)
    assert metrics["warped_depth_2_to_1"].shape == (B, H, W, 1)


def test_predict_step(setup):
    config, model, fresh = setup
    state = fresh()
    batch = _synthetic_batch()
    depth = jax.jit(training.predict_step)(
        state, jnp.asarray(batch["color_1"]), jnp.asarray(batch["boundary"]))
    assert depth.shape == (B, H, W, 1)
    assert (np.asarray(depth) >= 0).all()


def test_dcl_warmup_schedule():
    config = training.TrainConfig()
    assert training.dcl_weight_for_epoch(0, config) == 0.1
    assert training.dcl_weight_for_epoch(20, config) == 0.1
    assert training.dcl_weight_for_epoch(21, config) == 5.0


def test_eval_step_batch_stats_mode(setup):
    """use_batch_stats=True (the reference's training-loop validation runs
    BN in train mode, its train.py:234,380) differs from running-average
    mode once the stats have diverged from init."""
    config, model, fresh = setup
    state = fresh()
    # push batch stats away from the (0, 1) init with a couple of steps
    step_fn = training.make_jit_train_step(config)
    batch = jax.tree.map(jnp.asarray, _synthetic_batch())
    for _ in range(2):
        state, _ = step_fn(state, batch, jnp.asarray(0.1))
    ev_run = training.make_jit_eval_step(config)
    ev_bat = training.make_jit_eval_step(config, use_batch_stats=True)
    a = float(ev_run(state, batch, jnp.asarray(5.0))["loss"])
    b = float(ev_bat(state, batch, jnp.asarray(5.0))["loss"])
    assert np.isfinite(a) and np.isfinite(b)
    assert a != b


def test_train_step_without_batch_stats_collection():
    """Models with no normalization layers (UNet, reference
    models.py:211-264) have no batch_stats collection; the train step
    must run and update parameters regardless (train.py exposes
    --architecture unet)."""
    from endoscopydepthestimation_pytorch_tpu.models import UNet
    config = training.TrainConfig(lr_step_size=50)
    model = UNet(out_channels=1, depth=3, wf=3)
    state = training.create_train_state(model, jax.random.PRNGKey(0),
                                        (1, H, W, 3), config)
    assert state.batch_stats == {}
    batch = {k: jnp.asarray(v) for k, v in _synthetic_batch().items()}
    step = training.make_jit_train_step(config)
    new_state, metrics = step(state, batch, jnp.asarray(0.1, jnp.float32))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_grad_accum_unet_bit_parity():
    """grad_accum=2 on a BN-free model (UNet) produces the same update as
    the direct batch step — accumulation only reorders equal-weight
    per-sample means (training.train_step docstring)."""
    from endoscopydepthestimation_pytorch_tpu.models import UNet
    config = training.TrainConfig(lr_step_size=50)
    model = UNet(out_channels=1)
    state0 = training.create_train_state(model, jax.random.PRNGKey(2),
                                         (1, H, W, 3), config)
    batch = jax.tree.map(jnp.asarray, _synthetic_batch(batch=4))

    direct = training.make_jit_train_step(config)(
        jax.tree.map(jnp.array, state0), batch, jnp.asarray(5.0))
    accum = training.make_jit_train_step(config, grad_accum=2)(
        jax.tree.map(jnp.array, state0), batch, jnp.asarray(5.0))

    np.testing.assert_allclose(float(direct[1]["loss"]),
                               float(accum[1]["loss"]), rtol=2e-6)
    np.testing.assert_allclose(float(direct[1]["grad_norm"]),
                               float(accum[1]["grad_norm"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(direct[0].params),
                    jax.tree.leaves(accum[0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_grad_accum_fcdensenet_runs_and_images(setup):
    """BN model under grad_accum: finite metrics, BN stats advance, and the
    with_images variant returns boards in original row order."""
    config, model, fresh = setup
    state = fresh()
    stats0 = jax.tree.map(np.asarray, state.batch_stats)  # before donation
    batch = jax.tree.map(jnp.asarray, _synthetic_batch(batch=4))
    step = training.make_jit_train_step(config, with_images=True, grad_accum=2)
    new_state, metrics = step(state, batch, jnp.asarray(0.1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    assert metrics["scaled_depth_1"].shape == (4, H, W, 1)
    assert metrics["flows_from_depth_2"].shape == (4, H, W, 2)
    # microbatch stats differ from the init stats => they advanced
    changed = [not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(stats0),
                               jax.tree.leaves(new_state.batch_stats))]
    assert any(changed)
