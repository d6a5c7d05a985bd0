"""Weight re-initialization schemes (reference utils.py:619-671).

Our Flax models initialize with Kaiming-normal(fan_in, relu) at
construction (the reference driver's configuration, train.py:193-195).
``reinitialize_params`` covers the rest of the reference's ``init_net``
surface: glorot/kaiming x uniform/normal, zero biases, BN scale=1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _initializer(init_type: str, mode: str, distribution: str):
    dist = "normal" if distribution == "normal" else "uniform"
    if init_type == "glorot":
        return nn.initializers.variance_scaling(1.0, "fan_avg", dist)
    if init_type == "kaiming":
        return nn.initializers.variance_scaling(2.0, mode, dist)
    raise ValueError(f"unknown init type {init_type!r}")


def reinitialize_params(params, rng, init_type: str = "kaiming",
                        mode: str = "fan_in", distribution: str = "normal"):
    """Fresh weights for an existing param tree.

    Conv/dense kernels get the chosen scheme; biases zero; BatchNorm
    scale 1 / bias 0 (reference utils.py:629-671 semantics).
    """
    init = _initializer(init_type, mode, distribution)
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(rng, len(flat[0]))

    new_leaves = []
    for (path, leaf), key in zip(flat[0], keys):
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "kernel" and leaf.ndim >= 2:
            new_leaves.append(init(key, leaf.shape, leaf.dtype))
        elif name == "scale":   # BatchNorm scale
            new_leaves.append(jnp.ones_like(leaf))
        else:                   # biases (and anything else) -> zero
            new_leaves.append(jnp.zeros_like(leaf))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
