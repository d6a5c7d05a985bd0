"""fp8 (e4m3) compressed-activation backward — ops/act8.py.

``act8`` keeps the forward EXACT (bit-identical to the default
materialized path — values, losses, BN statistics, inference) and only
compresses what the backward sees: each dense block's custom VJP saves
an e4m3 copy of the block input and replays the block from it. These
tests are its contract: quantizer correctness, forward exactness at
block and model level, bounded gradient deviation (the quantization
error is contained per block), and the residual actually being fp8.

The straight-through QAT design this replaced is a recorded negative
result (PERF.md): quantizing the forward made the full-model gradient
chaotic (cosine 0.10-0.78 vs exact, varying with compilation context).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endoscopydepthestimation_pytorch_tpu import training
from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57
from endoscopydepthestimation_pytorch_tpu.models.fcdensenet import DenseBlock
from endoscopydepthestimation_pytorch_tpu.ops import act8
from endoscopydepthestimation_pytorch_tpu.ops.dense_block import (
    dense_block_apply)

from test_training import _synthetic_batch, H, W, B


def test_quantize8_roundtrip():
    y = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 16, 12),
                          jnp.float32) * 3.0
    q, s = act8.quantize8(y)
    assert q.dtype == jnp.float8_e4m3fn and s.shape == (12,)
    out = np.asarray(act8.dequantize8(q, s, jnp.float32))
    # e4m3 resolution: 3 mantissa bits => relative error <= 2^-4
    rel = np.abs(out - np.asarray(y)) / np.maximum(np.abs(np.asarray(y)), 1e-6)
    assert float(rel.max()) <= 2.0 ** -4 + 1e-6


def test_quantize8_scale_respects_ieee_e4m3_240_max():
    # Machinery that round-trips saves through reduce_precision(exp=4,
    # mant=3) has IEEE e4m3 semantics: max finite 240, values above round
    # to inf — and e4m3fn has no inf, so they'd come back NaN. quantize8
    # must keep |y/s| <= 240.
    y = jnp.asarray([[300.0, -448.0, 1e-4, 447.9]], jnp.float32)
    q, s = act8.quantize8(y)
    scaled = y / s
    assert float(jnp.max(jnp.abs(scaled))) <= 240.0 + 1e-3
    rt = jax.lax.reduce_precision(scaled, exponent_bits=4, mantissa_bits=3)
    assert bool(jnp.all(jnp.isfinite(rt)))
    assert bool(jnp.all(jnp.isfinite(act8.dequantize8(q, s, jnp.float32))))


def _block_args(key, c0=6, growth=4, n_layers=3, shape=(4, 8, 16)):
    ks = jax.random.split(key, 2 + 2 * n_layers)
    b, h, w = shape
    x = jax.random.normal(ks[0], (b, h, w, c0), jnp.float32)
    gammas = tuple(1.0 + 0.1 * jax.random.normal(ks[1 + j], (c0 + j * growth,))
                   for j in range(n_layers))
    betas = tuple(0.1 * jax.random.normal(ks[1 + n_layers + j],
                                          (c0 + j * growth,))
                  for j in range(n_layers))
    kernels = tuple(jax.random.normal(
        jax.random.fold_in(key, 100 + j), (3, 3, c0 + j * growth, growth),
        jnp.float32) * 0.2 for j in range(n_layers))
    biases = tuple(jnp.zeros((growth,)) for _ in range(n_layers))
    dims = (growth, n_layers, 1e-5, None)
    return dims, x, gammas, betas, kernels, biases


def test_block_forward_matches_buffered_twin():
    # act8's exact forward must equal dense_block_apply's (the buffered
    # block with identical folded-BN math) — buffer, mean, mean_sq.
    dims, x, g, b, k, bi = _block_args(jax.random.PRNGKey(1))
    buf_a, mu_a, m2_a = act8.act8_block_apply(dims, x, g, b, k, bi)
    buf_b, mu_b, m2_b = dense_block_apply(dims, x, g, b, k, bi)
    np.testing.assert_allclose(np.asarray(buf_a), np.asarray(buf_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_b),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m2_a), np.asarray(m2_b),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("mode", ["replay", "saved_buf"])
def test_block_grad_contained_deviation(mode, monkeypatch):
    # Block-level contract, both backward modes (ops/act8.py BWD_MODE):
    # gradients of the compressed backward vs exact autodiff of the same
    # math — direction preserved (cos > 0.99), norm within a few percent.
    monkeypatch.setattr(act8, "BWD_MODE", mode)
    dims, x, g, b, k, bi = _block_args(jax.random.PRNGKey(2))

    def loss_via(fn):
        def loss(args):
            buf, mu, m2 = fn(dims, *args)
            return (jnp.mean(buf.astype(jnp.float32) ** 2)
                    + jnp.sum(mu) * 0.1 + jnp.sum(m2) * 0.01)
        return jax.grad(loss)((x, g, b, k, bi))

    g_exact = loss_via(act8._mat_impl)
    g_act8 = loss_via(act8.act8_block_apply)
    le = jnp.concatenate([jnp.asarray(v, jnp.float32).ravel()
                          for v in jax.tree.leaves(g_exact)])
    lq = jnp.concatenate([jnp.asarray(v, jnp.float32).ravel()
                          for v in jax.tree.leaves(g_act8)])
    cos = float(jnp.vdot(le, lq) / (jnp.linalg.norm(le) * jnp.linalg.norm(lq)))
    rel = float(jnp.linalg.norm(lq - le) / jnp.linalg.norm(le))
    assert cos > 0.99, cos
    assert rel < 0.10, rel


def test_block_residual_is_fp8():
    # The saved residual between forward and backward must be the e4m3
    # copy — visible as a float8 type in the grad program's jaxpr.
    dims, x, g, b, k, bi = _block_args(jax.random.PRNGKey(3))

    def loss(x):
        buf, _, _ = act8.act8_block_apply(dims, x, g, b, k, bi)
        return jnp.mean(buf ** 2)

    jaxpr = jax.make_jaxpr(jax.grad(loss))(x)
    assert "f8_e4m3fn" in str(jaxpr)


def test_dense_block_act8_flax_forward_exact():
    # The flax plumbing (DenseBlock(act8=True)) must produce the default
    # materialized path's output bit-for-bit in train mode, for both the
    # upsample (new-features) and with_stats (TransitionDown) variants.
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 8, 16, 6), jnp.float32)
    for kw in ({"upsample": True}, {"with_stats": True}):
        ref_blk = DenseBlock(growth_rate=4, n_layers=3, **kw)
        q_blk = DenseBlock(growth_rate=4, n_layers=3, act8=True, **kw)
        variables = jax.jit(ref_blk.init, static_argnums=2)(
            jax.random.PRNGKey(0), x, True)
        out_r, vars_r = ref_blk.apply(variables, x, True,
                                      mutable=["batch_stats"])
        out_q, vars_q = q_blk.apply(variables, x, True,
                                    mutable=["batch_stats"])
        for a, b in zip(jax.tree.leaves((out_r, vars_r)),
                        jax.tree.leaves((out_q, vars_q))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)


def test_model_act8_forward_exact_and_grad_close():
    # Model level: the act8 forward (and therefore depth output, loss, BN
    # stats) computes the exact model's math — identical values up to
    # compiler rounding; the gradient deviates only within the
    # per-block-contained quantization envelope (measured cos 0.9896 with
    # blocks alone, 0.980 with the transitions/final conv also compressed,
    # at 32x32/b8 — bounded at 0.97 here).
    config = training.TrainConfig(lr_step_size=50)
    batch = {k: jnp.asarray(v) for k, v in
             _synthetic_batch(batch=8, h=32, w=32).items()}
    exact = FCDenseNet57(n_classes=1)
    quant = FCDenseNet57(n_classes=1, act8=True)
    state = training.create_train_state(exact, jax.random.PRNGKey(0),
                                        (1, 32, 32, 3), config)
    eps = config.zero_division_epsilon

    def grads_for(model):
        def loss_fn(params):
            d1, d2, _ = training._forward_pair(
                model.apply, params, state.batch_stats, batch, train=True)
            loss, _ = training.compute_losses(
                d1, d2, batch, config.sfl_weight, jnp.asarray(0.1), eps)
            return loss, (d1, d2)
        (l, (d1, d2)), g = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(state.params)
        flat = jnp.concatenate([jnp.asarray(v, jnp.float32).ravel()
                                for v in jax.tree.leaves(g)])
        return float(l), d1, flat

    l_e, d1_e, g_e = grads_for(exact)
    l_q, d1_q, g_q = grads_for(quant)
    # same math => same values up to compiler rounding (the two programs
    # fuse differently inside value_and_grad; standalone jitted forwards
    # measure bit-identical — a few ulps here)
    assert float(jnp.max(jnp.abs(d1_e - d1_q))) < 1e-5
    assert l_e == pytest.approx(l_q, rel=1e-5)
    cos = float(jnp.vdot(g_e, g_q)
                / (jnp.linalg.norm(g_e) * jnp.linalg.norm(g_q)))
    assert cos > 0.97, cos
    assert float(jnp.linalg.norm(g_q)) == pytest.approx(
        float(jnp.linalg.norm(g_e)), rel=0.05)


def test_model_act8_train_step():
    # One full optimization step through the jitted train step: the loss
    # metric is the exact model's loss up to compiler rounding (the
    # transitions' dot_general/reduce_window formulation rounds a few
    # ulps differently from nn.Conv/max_pool, and the SFL/DCL ratio
    # losses amplify that to ~1e-4 relative), and the update stays
    # finite.
    config = training.TrainConfig(lr_step_size=50)
    batch = {k: jnp.asarray(v) for k, v in _synthetic_batch().items()}
    dclw = jnp.asarray(5.0, jnp.float32)

    exact = FCDenseNet57(n_classes=1)
    quant = FCDenseNet57(n_classes=1, act8=True)
    state = training.create_train_state(exact, jax.random.PRNGKey(0),
                                        (1, H, W, 3), config)
    step = training.make_jit_train_step(config)
    losses = {}
    for name, model in [("exact", exact), ("act8", quant)]:
        st = jax.tree.map(jnp.array, state).replace(apply_fn=model.apply)
        st, m = step(st, batch, dclw)
        losses[name] = float(m["loss"])
        assert np.isfinite(losses[name]), losses
        assert int(st.step) == 1
    assert losses["act8"] == pytest.approx(losses["exact"], rel=1e-3), losses
