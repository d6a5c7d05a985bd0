"""Pallas fused dense-conv engine: parity against the XLA formulation
(interpret mode on CPU) at the op level and at the model level (fused
FCDenseNet vs unfused — identical parameter tree, matching outputs,
matching gradients and BN statistics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57
from endoscopydepthestimation_pytorch_tpu.models.fcdensenet import FCDenseNet
from endoscopydepthestimation_pytorch_tpu.ops import dense_conv


@pytest.fixture(autouse=True)
def interpret_mode():
    old = dense_conv.INTERPRET
    dense_conv.INTERPRET = True
    yield
    dense_conv.INTERPRET = old


def _xla_layer(x, scale, shift, w):
    a = jnp.maximum(x * scale + shift, 0.0)
    return jax.lax.conv_general_dilated(
        a, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("b,h,w,c,f", [
    (8, 16, 32, 20, 12),     # 2 K-chunk-free rows
    (8, 32, 40, 150, 12),    # 2 K-chunks, ragged last chunk
    (16, 8, 16, 7, 5),       # odd channel/feature counts
])
def test_fused_dense_conv_forward_parity(b, h, w, c, f):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, c, f) * 0.2, jnp.float32)
    scale = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    shift = jnp.asarray(rng.randn(c) * 0.3, jnp.float32)
    ref = _xla_layer(x, scale, shift, wk)
    got = dense_conv.fused_dense_conv(x, scale, shift, wk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_dense_conv_grad_parity():
    rng = np.random.RandomState(1)
    b, h, w, c, f = 8, 16, 32, 20, 12
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, c, f) * 0.2, jnp.float32)
    scale = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    shift = jnp.asarray(rng.randn(c) * 0.3, jnp.float32)

    def loss_ref(x, s, sh, wk):
        return jnp.sum(jnp.sin(_xla_layer(x, s, sh, wk)))

    def loss_new(x, s, sh, wk):
        return jnp.sum(jnp.sin(dense_conv.fused_dense_conv(x, s, sh, wk)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, scale, shift, wk)
    gn = jax.grad(loss_new, argnums=(0, 1, 2, 3))(x, scale, shift, wk)
    for name, a, bb in zip(("dx", "dscale", "dshift", "dw"), gr, gn):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=2e-4, atol=5e-4, err_msg=name)


def _tiny_model(fused):
    # small config whose 80-wide stage qualifies for fusion
    return FCDenseNet(down_blocks=(2, 2), up_blocks=(2, 2),
                      bottleneck_layers=2, growth_rate=12,
                      out_chans_first_conv=24, n_classes=1, fused=fused)


def test_fused_model_matches_unfused():
    """Same params, same input: fused and unfused models agree on output,
    gradients, and BN batch-stat updates; parameter trees are identical."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(8, 64, 80, 3), jnp.float32)

    m_ref = _tiny_model(False)
    m_fused = _tiny_model(True)
    variables = m_ref.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 80, 3)),
                           train=False)
    v2 = m_fused.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 80, 3)),
                      train=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))

    # eval mode (running stats)
    y_ref = m_ref.apply(variables, x, train=False)
    y_fused = m_fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)

    # train mode: outputs + updated batch stats
    y_ref, mut_ref = m_ref.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
    y_fused, mut_fused = m_fused.apply(variables, x, train=True,
                                       mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(mut_ref), jax.tree.leaves(mut_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)

    # gradients
    def loss(m, params):
        y = m.apply({"params": params,
                     "batch_stats": variables["batch_stats"]}, x, train=True,
                    mutable=["batch_stats"])[0]
        return jnp.mean(jnp.square(y))

    g_ref = jax.grad(lambda p: loss(m_ref, p))(variables["params"])
    g_fused = jax.grad(lambda p: loss(m_fused, p))(variables["params"])
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


def test_fused_falls_back_on_small_shapes():
    """Batches not divisible by 8 / narrow maps run the unfused path with
    the same parameters — no shape errors, same results."""
    rng = np.random.RandomState(3)
    m = _tiny_model(True)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 80, 3)),
                       train=False)
    x = jnp.asarray(rng.rand(2, 64, 80, 3), jnp.float32)  # b=2: fallback
    y = m.apply(variables, x, train=False)
    assert y.shape == (2, 64, 80, 1)
