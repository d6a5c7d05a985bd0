"""Parity of the three dense-block evaluation strategies.

The reference block (models.py:31-53) materializes the growing concat at
every layer. Our DenseBlock has three mathematically-identical evaluation
modes — materialized (default, with shared per-segment BN statistics),
``segmented`` (virtual concat as a segment list) and ``buffered``
(append-only buffer + block-level custom VJP, ops/dense_block.py). They
must produce the same outputs, gradients, and running-statistics updates
from the same parameter tree.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endoscopydepthestimation_pytorch_tpu.models.fcdensenet import DenseBlock
from endoscopydepthestimation_pytorch_tpu.ops import dense_conv


@pytest.fixture(autouse=True)
def interpret_mode():
    old = dense_conv.INTERPRET
    dense_conv.INTERPRET = True
    yield
    dense_conv.INTERPRET = old


def _flat(out):
    if isinstance(out, (list, tuple)) and not isinstance(out[0], (list, tuple)):
        if isinstance(out, tuple) and len(out) == 2 and isinstance(out[1], tuple):
            return out[0]  # (buf, stats) from with_stats
        return jnp.concatenate(list(out), axis=-1)  # segment list
    return out


def _run(mode_kwargs, variables, x):
    blk = DenseBlock(growth_rate=4, n_layers=3, upsample=True, **mode_kwargs)

    def loss(v):
        out, updates = blk.apply(v, x, True, mutable=["batch_stats"])
        return jnp.sum(jnp.sin(_flat(out))), updates

    (val, updates), grads = jax.value_and_grad(loss, has_aux=True)(variables)
    return val, grads, updates


@pytest.mark.parametrize("mode", [{"segmented": True}, {"buffered": True},
                                  {"block_packed": True}])
def test_dense_block_modes_match_materialized(mode):
    # b % 8 == 0 and w % 8 == 0 so block_packed engages its Pallas path
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 16, 6), jnp.float32)
    ref_blk = DenseBlock(growth_rate=4, n_layers=3, upsample=True)
    variables = jax.jit(ref_blk.init, static_argnums=2)(key, x, True)

    v0, g0, u0 = _run({}, variables, x)
    v1, g1, u1 = _run(mode, variables, x)

    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5, atol=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(g0["params"])
    flat1 = {jax.tree_util.keystr(k): a
             for k, a in jax.tree_util.tree_leaves_with_path(g1["params"])}
    for k, a in flat0:
        np.testing.assert_allclose(
            np.asarray(flat1[jax.tree_util.keystr(k)]), np.asarray(a),
            rtol=2e-4, atol=2e-4, err_msg=f"grad mismatch at {k}")
    stats1 = {jax.tree_util.keystr(k): a
              for k, a in jax.tree_util.tree_leaves_with_path(u1["batch_stats"])}
    for k, a in jax.tree_util.tree_leaves_with_path(u0["batch_stats"]):
        np.testing.assert_allclose(
            np.asarray(stats1[jax.tree_util.keystr(k)]), np.asarray(a),
            rtol=1e-5, atol=1e-5, err_msg=f"batch_stats mismatch at {k}")


def test_block_packed_falls_back_on_shard_sized_batches():
    """block_packed requires B % 8 == 0 and W % 8 == 0 (packed layout);
    shard_map hands each device a tiny per-shard batch, so the gate must
    silently fall back to the materialized path with identical results."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 16, 6), jnp.float32)
    ref = DenseBlock(growth_rate=4, n_layers=3, upsample=True)
    variables = jax.jit(ref.init, static_argnums=2)(key, x, True)
    v0, g0, _ = _run({}, variables, x)
    v1, g1, _ = _run({"block_packed": True}, variables, x)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-6)
