"""Parity of the round-3 whole-block Pallas engine (ops/block_engine.py)
against the materialized DenseBlock path: forward values, gradients
(including the BN-through-batch-stats term and the stats-output
cotangents), and running-statistics updates, from the same parameter tree.
Runs the kernels in interpret mode on CPU; reference semantics are the
upstream models.py:19-53."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endoscopydepthestimation_pytorch_tpu.models.fcdensenet import DenseBlock
from endoscopydepthestimation_pytorch_tpu.ops import block_engine


@pytest.fixture(autouse=True)
def interpret_mode():
    old = block_engine.INTERPRET
    block_engine.INTERPRET = True
    yield
    block_engine.INTERPRET = old


def _grads_close(g0, g1, rtol, atol):
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g1)}
    assert len(flat0) == len(flat1)
    for k, v0 in flat0:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(flat1[ks]), np.asarray(v0),
                                   rtol=rtol, atol=atol, err_msg=ks)


@pytest.mark.parametrize("upsample", [True, False])
def test_engine_matches_materialized(upsample):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 16, 6), jnp.float32)
    ref_blk = DenseBlock(growth_rate=4, n_layers=3, upsample=upsample)
    eng_blk = DenseBlock(growth_rate=4, n_layers=3, upsample=upsample,
                         block_engine=True)
    variables = jax.jit(ref_blk.init, static_argnums=2)(key, x, True)

    def run(blk):
        def loss(v):
            out, updates = blk.apply(v, x, True, mutable=["batch_stats"])
            return jnp.sum(jnp.sin(out)), updates
        (val, updates), grads = jax.value_and_grad(loss, has_aux=True)(variables)
        return val, grads, updates

    v0, g0, u0 = run(ref_blk)
    v1, g1, u1 = run(eng_blk)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5, atol=1e-5)
    _grads_close(g0["params"], g1["params"], 2e-4, 2e-4)
    _grads_close(u0["batch_stats"], u1["batch_stats"], 1e-5, 1e-5)


def test_engine_with_stats_cotangent():
    """with_stats blocks feed (mu, m2) into TransitionDown — the stats
    cotangent path (the lazy C1/C2 affine) must match the autodiff of the
    materialized path."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 8, 16, 6), jnp.float32)
    ref_blk = DenseBlock(growth_rate=4, n_layers=2, with_stats=True)
    eng_blk = DenseBlock(growth_rate=4, n_layers=2, with_stats=True,
                         block_engine=True)
    variables = jax.jit(ref_blk.init, static_argnums=2)(key, x, True)

    def run(blk):
        def loss(v):
            (buf, (mu, m2)), updates = blk.apply(v, x, True,
                                                 mutable=["batch_stats"])
            return (jnp.sum(jnp.sin(buf)) + jnp.sum(jnp.cos(mu * 3))
                    + jnp.sum(jnp.sin(m2 * 2)), updates)
        (val, updates), grads = jax.value_and_grad(loss, has_aux=True)(variables)
        return val, grads

    v0, g0 = run(ref_blk)
    v1, g1 = run(eng_blk)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5, atol=1e-5)
    _grads_close(g0["params"], g1["params"], 2e-4, 2e-4)


def test_engine_gate_falls_back():
    """Shapes the engine cannot take (W % 16 != 0) run the materialized
    path under the same flag and parameter tree."""
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 10, 6), jnp.float32)
    ref_blk = DenseBlock(growth_rate=4, n_layers=2, upsample=True)
    eng_blk = DenseBlock(growth_rate=4, n_layers=2, upsample=True,
                         block_engine=True)
    variables = jax.jit(ref_blk.init, static_argnums=2)(key, x, True)
    y0 = ref_blk.apply(variables, x, True, mutable=["batch_stats"])[0]
    y1 = eng_blk.apply(variables, x, True, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-5,
                               atol=1e-5)


def test_engine_grad_parity_under_shardmap():
    """The engine's shard_map contract (ADVICE r2 medium bug class): with
    axis_name set, per-shard kernels + XLA pmean/psum between pallas calls
    must reproduce the single-device gradients — including the stats
    cotangents consumed replicated (the BNFold/TransitionDown convention:
    the per-shard loss is pmean'd BEFORE grad, parameter cotangents leave
    the custom VJP global)."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P
    from endoscopydepthestimation_pytorch_tpu.ops.block_engine import (
        block_engine_apply)

    # the vma-checked shard_map path must run through a mode that honors
    # vma transpose semantics (check_vma=False changes the psum/pmean
    # transposes and would test the wrong contract). The HLO interpreter
    # (INTERPRET=True, set by the fixture) rejects vma-varying pallas
    # operands, so use the Mosaic TPU interpret mode — on a 2-device mesh:
    # the 8-device simulation aborts allocating buffers on this VM.
    block_engine.INTERPRET = pltpu.InterpretParams()
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    growth, n_layers, eps = 4, 2, 1e-5
    # per-shard batch 8 passes the engine gate; c0 = 128 keeps the aliased
    # gx block's lane dim equal to the array dim — the TPU interpret mode
    # (unlike real Mosaic, which pads: the c0=48 blocks compile and run on
    # hardware) returns lane-padded outputs when block lane > array lane
    b, h, w, c0 = 16, 8, 16, 128
    ctot = c0 + n_layers * growth
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c0).astype(np.float32))
    gammas = tuple(jnp.asarray(rng.rand(c0 + j * growth).astype(np.float32) + 0.5)
                   for j in range(n_layers))
    betas = tuple(jnp.asarray(rng.randn(c0 + j * growth).astype(np.float32) * 0.1)
                  for j in range(n_layers))
    kernels = tuple(jnp.asarray(
        rng.randn(3, 3, c0 + j * growth, growth).astype(np.float32) * 0.2)
        for j in range(n_layers))
    biases = tuple(jnp.asarray(rng.randn(growth).astype(np.float32) * 0.1)
                   for j in range(n_layers))
    w_buf = jnp.asarray(rng.randn(b, h, w, ctot).astype(np.float32))
    w_mu = jnp.asarray(rng.randn(ctot).astype(np.float32))
    w_m2 = jnp.asarray(rng.randn(ctot).astype(np.float32))
    n_dev = mesh.devices.size

    def objective(buf, mu, m2, w_buf_):
        return (jnp.sum(buf * w_buf_)
                + jnp.sum(buf * (mu * w_mu + m2 * w_m2)[None, None, None, :]))

    def loss_single(params, x):
        buf, mu, m2 = block_engine_apply((growth, n_layers, eps, None),
                                         x, *params)
        return objective(buf, mu, m2, w_buf) / n_dev

    def per_shard(params, xs, wb):
        def local_loss(p, xs_):
            buf, mu, m2 = block_engine_apply(
                (growth, n_layers, eps, "data"), xs_, *p)
            mu = jax.lax.pmean(mu, "data")
            m2 = jax.lax.pmean(m2, "data")
            return jax.lax.pmean(objective(buf, mu, m2, wb), "data")

        loss, (gp, gx) = jax.value_and_grad(
            local_loss, argnums=(0, 1))(params, xs)
        return loss, jax.lax.pmean(gp, "data"), gx

    shard_fn = jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P(), P("data"))))

    params = (gammas, betas, kernels, biases)
    v1, (gp1, gx1) = jax.jit(jax.value_and_grad(
        loss_single, argnums=(0, 1)))(params, x)
    v8, gp8, gx8 = shard_fn(params, x, w_buf)
    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1),
                               rtol=1e-3, atol=2e-4)
    for a, b2 in zip(jax.tree.leaves(gp1), jax.tree.leaves(gp8)):
        np.testing.assert_allclose(np.asarray(b2), np.asarray(a),
                                   rtol=1e-3, atol=1e-3)


def test_engine_growth12_wide_input():
    """growth 12 (NF=96 lanes, the FCDenseNet57 config) with a 140-channel
    input exercising multiple K chunks."""
    key = jax.random.PRNGKey(6)
    x = jax.random.normal(jax.random.PRNGKey(7), (8, 8, 16, 140), jnp.float32)
    ref_blk = DenseBlock(growth_rate=12, n_layers=2, upsample=True)
    eng_blk = DenseBlock(growth_rate=12, n_layers=2, upsample=True,
                         block_engine=True)
    variables = jax.jit(ref_blk.init, static_argnums=2)(key, x, True)

    def run(blk):
        def loss(v):
            out, updates = blk.apply(v, x, True, mutable=["batch_stats"])
            return jnp.sum(jnp.sin(out)), updates
        (val, updates), grads = jax.value_and_grad(loss, has_aux=True)(variables)
        return val, grads

    v0, g0 = run(ref_blk)
    v1, g1 = run(eng_blk)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-4, atol=1e-4)
    _grads_close(g0["params"], g1["params"], 5e-4, 5e-4)


def test_engine_growth16_nf128():
    """growth 16 (NF = 8*16 = 128 lanes — the FCDenseNet67/103 config,
    exactly one full lane tile per packed segment, a different Mosaic
    tiling regime than NF=96) with 3 layers: forward + full-grad parity."""
    key = jax.random.PRNGKey(8)
    x = jax.random.normal(jax.random.PRNGKey(9), (8, 8, 16, 10), jnp.float32)
    ref_blk = DenseBlock(growth_rate=16, n_layers=3, upsample=False)
    eng_blk = DenseBlock(growth_rate=16, n_layers=3, upsample=False,
                         block_engine=True)
    variables = jax.jit(ref_blk.init, static_argnums=2)(key, x, True)

    def run(blk):
        def loss(v):
            out, updates = blk.apply(v, x, True, mutable=["batch_stats"])
            return jnp.sum(jnp.sin(out)), updates
        (val, updates), grads = jax.value_and_grad(loss, has_aux=True)(variables)
        return val, grads

    v0, g0 = run(ref_blk)
    v1, g1 = run(eng_blk)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-4, atol=1e-4)
    _grads_close(g0["params"], g1["params"], 5e-4, 5e-4)
