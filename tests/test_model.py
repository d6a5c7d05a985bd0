"""FCDenseNet architecture parity: parameter counts, shapes, and — with
weights transferred — numerical agreement with the reference torch model
(run on CPU as the oracle)."""
import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endoscopydepthestimation_pytorch_tpu.models import (
    FCDenseNet57, FCDenseNet103, UNet, convert_reference_state_dict)


def _load_reference_models():
    """Import the reference torch model definitions (model classes only;
    they are CPU-safe — only the geometry layers hardcode .cuda())."""
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("ref_models", "/root/reference/models.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_models"] = mod
    spec.loader.exec_module(mod)
    return torch, mod


def _init(model, shape, train=False):
    """jit the init: eager flax init compiles every conv shape separately
    (~2 min on CPU); a jitted init compiles the whole graph once."""
    return jax.jit(lambda k: model.init(k, jnp.zeros(shape), train=train))(
        jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def flax_57():
    model = FCDenseNet57(n_classes=1)
    return model, _init(model, (1, 64, 64, 3))


def test_output_shape_and_nonnegativity(flax_57):
    model, variables = flax_57
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    y = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert y.shape == (2, 64, 64, 1)
    assert (np.asarray(y) >= 0).all()
    assert y.dtype == jnp.float32


def test_param_count_matches_torch(flax_57):
    torch, ref = _load_reference_models()
    tmodel = ref.FCDenseNet57(n_classes=1)
    torch_params = sum(p.numel() for p in tmodel.parameters())
    _, variables = flax_57
    flax_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert flax_params == torch_params


def test_forward_matches_torch_with_transferred_weights(flax_57):
    torch, ref = _load_reference_models()
    torch.manual_seed(0)
    tmodel = ref.FCDenseNet57(n_classes=1)
    tmodel.eval()

    variables = convert_reference_state_dict(tmodel.state_dict())
    model, init_vars = flax_57
    # converted trees must structurally match the initialized ones
    assert (jax.tree_util.tree_structure(init_vars["params"]) ==
            jax.tree_util.tree_structure(jax.tree.map(jnp.asarray, variables["params"])))

    x = np.random.RandomState(0).randn(2, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(x)).numpy()
    fy = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        {"params": jax.tree.map(jnp.asarray, variables["params"]),
         "batch_stats": jax.tree.map(jnp.asarray, variables["batch_stats"])},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    fy = np.asarray(fy).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(fy, ty, rtol=2e-4, atol=2e-5)


def test_train_mode_updates_batch_stats(flax_57):
    model, variables = flax_57
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3)) * 3 + 1
    y, mutated = jax.jit(
        lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"]))(variables, x)
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_odd_input_sizes_center_crop():
    # 5 maxpools => inputs must be multiples of 32; 64-multiples are the
    # contract (network_downsampling=64), check one non-square size
    model = FCDenseNet57(n_classes=1)
    variables = _init(model, (1, 128, 192, 3))
    y = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.zeros((1, 128, 192, 3)))
    assert y.shape == (1, 128, 192, 1)


def test_fcdensenet103_param_count():
    torch, ref = _load_reference_models()
    tmodel = ref.FCDenseNet103(n_classes=1)
    torch_params = sum(p.numel() for p in tmodel.parameters())
    model = FCDenseNet103(n_classes=1)
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 3)), train=False),
        jax.random.PRNGKey(0))
    flax_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert flax_params == torch_params


def test_unet_shapes():
    model = UNet(out_channels=1, depth=4, wf=4)
    variables = jax.jit(lambda k: model.init(k, jnp.zeros((1, 64, 64, 3))))(
        jax.random.PRNGKey(0))
    y = jax.jit(model.apply)(variables, jnp.zeros((2, 64, 64, 3)))
    assert y.shape == (2, 64, 64, 1)


def test_unet_upconv_mode():
    """The reference's transposed-conv up path (models.py:288-291): same
    output geometry, trainable, distinct parameterization."""
    model = UNet(out_channels=1, depth=4, wf=4, up_mode="upconv")
    variables = jax.jit(lambda k: model.init(k, jnp.zeros((1, 64, 64, 3))))(
        jax.random.PRNGKey(0))
    x = jnp.ones((2, 64, 64, 3))
    y = jax.jit(model.apply)(variables, x)
    assert y.shape == (2, 64, 64, 1)
    # transposed-conv kernels exist where the upsample path had plain convs
    up_kernel = variables["params"]["up2_conv"]["kernel"]
    assert up_kernel.shape[:2] == (3, 3)
    # gradient flows through the transposed convs
    g = jax.grad(lambda p: float(jnp.sum(model.apply({"params": p}, x))) if False
                 else jnp.sum(model.apply({"params": p}, x)))(variables["params"])
    gn = float(jnp.sqrt(sum(jnp.sum(jnp.square(t)) for t in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0

    import pytest as _pytest
    with _pytest.raises(ValueError, match="up_mode"):
        UNet(up_mode="nope", depth=3, wf=3).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))


def test_kaiming_init_statistics():
    """Conv kernels follow std=sqrt(2/fan_in) (reference utils.py:655-671)."""
    model = FCDenseNet57(n_classes=1)
    variables = _init(model, (1, 64, 64, 3))
    k = variables["params"]["firstconv"]["kernel"]  # (3, 3, 3, 48)
    fan_in = 3 * 3 * 3
    std = float(np.std(np.asarray(k)))
    assert abs(std - np.sqrt(2.0 / fan_in)) < 0.05
    assert np.allclose(variables["params"]["firstconv"]["bias"], 0.0)


def test_packed_conv_equals_plain(flax_57):
    """The MXU shifted-weight packed model must match the plain model
    bitwise-closely on identical params (same param tree!)."""
    model, variables = flax_57
    packed_model = FCDenseNet57(n_classes=1, packed=True)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 64, 3))
    a = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    b = jax.jit(lambda v, x: packed_model.apply(v, x, train=False))(variables, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_reinitialize_params_schemes(flax_57):
    from endoscopydepthestimation_pytorch_tpu.models import reinitialize_params
    model, variables = flax_57
    for init_type, dist in [("kaiming", "normal"), ("kaiming", "uniform"),
                            ("glorot", "normal"), ("glorot", "uniform")]:
        new = reinitialize_params(variables["params"], jax.random.PRNGKey(7),
                                  init_type=init_type, distribution=dist)
        assert (jax.tree_util.tree_structure(new) ==
                jax.tree_util.tree_structure(variables["params"]))
        k = np.asarray(new["firstconv"]["kernel"])
        assert np.std(k) > 0
        assert np.allclose(np.asarray(new["firstconv"]["bias"]), 0.0)
        # BatchNorm scales reset to 1
        bn = new["denseBlocksDown0"]["layers0"]["norm"]
        assert np.allclose(np.asarray(bn["scale"]), 1.0)
    # kaiming fan_in std check
    new = reinitialize_params(variables["params"], jax.random.PRNGKey(8))
    k = np.asarray(new["denseBlocksDown0"]["layers0"]["conv"]["kernel"])
    fan_in = k.shape[0] * k.shape[1] * k.shape[2]
    assert abs(float(np.std(k)) - np.sqrt(2.0 / fan_in)) < 0.02


def test_segmented_last_up_matches_default(flax_57):
    """segmented_last_up (the shipped training default as of round 3)
    virtualizes the final up block's concat; same parameter tree, same
    math — forward must agree with the materialized block in f32."""
    model, variables = flax_57
    seg_model = FCDenseNet57(n_classes=1, segmented_last_up=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))
    y0, u0 = jax.jit(lambda v, x: model.apply(
        v, x, train=True, mutable=["batch_stats"]))(variables, x)
    y1, u1 = jax.jit(lambda v, x: seg_model.apply(
        v, x, train=True, mutable=["batch_stats"]))(variables, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)


def test_split_last_skip_matches_default(flax_57):
    """split_last_skip keeps up4's [up, skip] input as separate segments
    (no 144-channel concat at full res); same parameter tree, same math —
    forward AND gradient must agree with the materialized model in f32."""
    model, variables = flax_57
    split_model = FCDenseNet57(n_classes=1, segmented_last_up=True,
                               split_last_skip=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))
    y0, _ = jax.jit(lambda v, x: model.apply(
        v, x, train=True, mutable=["batch_stats"]))(variables, x)
    y1, _ = jax.jit(lambda v, x: split_model.apply(
        v, x, train=True, mutable=["batch_stats"]))(variables, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)

    def loss(m):
        def f(v):
            y, _ = m.apply({**variables, "params": v["params"]}, x,
                           train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.square(y))
        return jax.jit(jax.grad(f))({"params": variables["params"]})

    g0, g1 = loss(model), loss(split_model)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)
