"""Data-parallel mesh: the full train step executes under an 8-device mesh
and matches the single-device result (same math, batch split over chips)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endoscopydepthestimation_pytorch_tpu import training
from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57
from endoscopydepthestimation_pytorch_tpu.parallel import (
    make_mesh, make_parallel_eval_step, make_parallel_predict_step,
    make_parallel_train_step, replicate_state, shard_batch)
from tests.test_training import _synthetic_batch


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
    return make_mesh()


@pytest.fixture(scope="module")
def setup():
    config = training.TrainConfig(lr_step_size=50)
    model = FCDenseNet57(n_classes=1)
    state = training.create_train_state(model, jax.random.PRNGKey(0),
                                        (1, 32, 32, 3), config)
    return config, model, state


def test_sharded_train_step_runs(mesh, setup):
    config, model, state = setup
    step_fn = make_parallel_train_step(config, mesh)
    batch = _synthetic_batch(batch=8, h=32, w=32)
    sharded = shard_batch(batch, mesh)
    pstate = replicate_state(jax.tree.map(jnp.array, state), mesh)
    pstate, metrics = step_fn(pstate, sharded, jnp.asarray(0.1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(pstate.step) == 1
    # batch axis of inputs really is split across the 8 devices
    assert len(sharded["color_1"].sharding.device_set) == 8


def test_sharded_matches_single_device(mesh, setup):
    """One step on the mesh == one step on one device (same global batch).
    BatchNorm batch stats are global means under pjit, identical to the
    single-device computation."""
    config, model, state = setup
    batch = _synthetic_batch(batch=8, h=32, w=32)

    single_fn = jax.jit(lambda s, b, w: training.train_step(s, b, w, config))
    s1, m1 = single_fn(jax.tree.map(jnp.array, state),
                       jax.tree.map(jnp.asarray, batch), jnp.asarray(0.1))

    step_fn = make_parallel_train_step(config, mesh)
    pstate = replicate_state(jax.tree.map(jnp.array, state), mesh)
    s8, m8 = step_fn(pstate, shard_batch(batch, mesh), jnp.asarray(0.1))

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-6)


def test_shardmap_matches_jit_path(mesh, setup):
    """The shard_map train step (per-shard Pallas-capable program, explicit
    pmean of grads + BN batch stats) reproduces the jit+shardings step to
    float rounding — same math, shard-then-mean reduction order."""
    from endoscopydepthestimation_pytorch_tpu.parallel import (
        make_shardmap_train_step)
    config, model, state = setup
    batch = _synthetic_batch(batch=8, h=32, w=32)

    jit_fn = make_parallel_train_step(config, mesh)
    s_jit, m_jit = jit_fn(replicate_state(jax.tree.map(jnp.array, state), mesh),
                          shard_batch(batch, mesh), jnp.asarray(0.1))

    sm_fn = make_shardmap_train_step(config, mesh, model)
    s_sm, m_sm = sm_fn(replicate_state(jax.tree.map(jnp.array, state), mesh),
                       shard_batch(batch, mesh), jnp.asarray(0.1))

    assert float(m_jit["loss"]) == pytest.approx(float(m_sm["loss"]), rel=1e-5)
    assert int(s_sm.step) == 1
    # same tolerance as test_sharded_matches_single_device: reduction order
    # differs (per-shard then cross-shard), gradients amplify the rounding
    for a, b in zip(jax.tree.leaves(s_jit.params), jax.tree.leaves(s_sm.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s_jit.batch_stats),
                    jax.tree.leaves(s_sm.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_sharded_eval_and_predict(mesh, setup):
    config, model, state = setup
    batch = _synthetic_batch(batch=8, h=32, w=32)
    sharded = shard_batch(batch, mesh)
    pstate = replicate_state(jax.tree.map(jnp.array, state), mesh)

    eval_fn = make_parallel_eval_step(config, mesh)
    metrics = eval_fn(pstate, sharded, jnp.asarray(5.0))
    assert np.isfinite(float(metrics["loss"]))

    predict_fn = make_parallel_predict_step(mesh)
    depth = predict_fn(pstate, sharded["color_1"], sharded["boundary"])
    assert depth.shape == (8, 32, 32, 1)
    assert len(depth.sharding.device_set) == 8  # output stays sharded


def test_make_mesh_for_batch_divisibility():
    from endoscopydepthestimation_pytorch_tpu.parallel import make_mesh_for_batch
    assert len(make_mesh_for_batch(8).devices.ravel()) == 8
    assert len(make_mesh_for_batch(2).devices.ravel()) == 2
    assert len(make_mesh_for_batch(3).devices.ravel()) == 3
    assert len(make_mesh_for_batch(1).devices.ravel()) == 1
    assert len(make_mesh_for_batch(12).devices.ravel()) == 6


def test_pad_batch_to():
    from endoscopydepthestimation_pytorch_tpu.parallel import pad_batch_to
    batch = {"color_1": np.zeros((3, 4, 4, 3)), "names": ["a", "b", "c"]}
    out = pad_batch_to(batch, 8)
    assert out["color_1"].shape[0] == 8
    assert out["_valid"] == 3
    assert out["names"] == ["a", "b", "c"]


def test_device_prefetch_order_and_errors(mesh):
    from endoscopydepthestimation_pytorch_tpu.parallel import device_prefetch
    batches = [{"x": np.full((8, 2), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), mesh))
    assert [int(np.asarray(b["x"])[0, 0]) for b in out] == [0, 1, 2, 3, 4]

    def bad():
        yield {"x": np.zeros((8, 2), np.float32)}
        raise RuntimeError("loader died")

    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="loader died"):
        list(device_prefetch(bad(), mesh))
