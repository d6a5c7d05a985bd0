"""Device-mesh data parallelism (the reference's DataParallel, TPU-native).

The reference replicates the model per GPU and scatter/gathers each batch
inside one process (torch.nn.DataParallel, train.py:197). Here a 1-D
``jax.sharding.Mesh`` over all chips carries the batch axis; parameters and
optimizer state are replicated; XLA inserts the gradient ``psum`` over ICI
automatically from the sharding annotations. The model is a small convnet
with no sequence dimension, so tensor/pipeline/sequence parallelism would
only add collective latency — the 1-D data axis saturates the chips
(SURVEY.md §2.11); the mesh helper still accepts a 2-D (replica, data)
layout for multi-pod DCN-aware setups.

Multi-host: each host feeds its local shard of the global batch;
``shard_batch`` builds the global array from per-host data via
``jax.make_array_from_process_local_data``.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import training

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_for_batch(batch_size: int, devices: Optional[Sequence] = None,
                        axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the largest device count that divides the global batch
    (a 2-sample debug batch on an 8-chip host uses 2 chips, not 8)."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    """Place a host batch onto the mesh, batch axis split across chips.

    Single-process: a plain device_put with the sharded layout. Multi-host
    (jax.process_count() > 1): every host passes its local slice and the
    global array is assembled without any cross-host copy.
    """
    sharding = batch_sharding(mesh)
    arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
                for k, v in arrays.items()}
    return {k: jax.device_put(jnp.asarray(v), sharding) for k, v in arrays.items()}


def replicate_state(state: training.TrainState, mesh: Mesh) -> training.TrainState:
    """Replicate parameters/optimizer state across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def make_parallel_train_step(config: training.TrainConfig, mesh: Mesh):
    """The jitted train step with explicit shardings: state replicated,
    batch split on the data axis. XLA turns the loss/grad reductions into
    ICI all-reduces; BatchNorm's batch-mean becomes a cross-replica mean
    (a strict improvement over DataParallel's per-replica BN stats —
    documented deviation)."""
    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    # shardings by pytree prefix: whole state replicated, whole batch sharded
    return jax.jit(
        partial(training.train_step, config=config),
        in_shardings=(rep, shard, rep),
        out_shardings=(rep, rep),
        donate_argnums=0)


def make_parallel_eval_step(config: training.TrainConfig, mesh: Mesh,
                            with_images: bool = False,
                            use_batch_stats: bool = False):
    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    # out_shardings left to the compiler: scalar metrics come back
    # replicated, image outputs stay batch-sharded
    return jax.jit(
        partial(training.eval_step, config=config, with_images=with_images,
                use_batch_stats=use_batch_stats),
        in_shardings=(rep, shard, rep))


def make_parallel_predict_step(mesh: Mesh):
    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    return jax.jit(training.predict_step,
                   in_shardings=(rep, shard, shard),
                   out_shardings=shard)


def pad_batch_to(batch: Dict[str, np.ndarray], batch_size: int) -> Dict[str, np.ndarray]:
    """Pad a ragged final batch up to the static batch size (XLA wants one
    shape); callers mask out the padding via the returned 'valid' count."""
    out = {}
    valid = batch_size
    for k, v in batch.items():
        if isinstance(v, list):
            out[k] = v
            continue
        valid = v.shape[0]
        if valid < batch_size:
            pad = np.repeat(v[-1:], batch_size - valid, axis=0)
            v = np.concatenate([v, pad], axis=0)
        out[k] = v
    out["_valid"] = valid
    return out


def device_prefetch(batches, mesh: Mesh, depth: int = 2):
    """Shard host batches onto the mesh ``depth`` steps ahead of the
    consumer, with the host->device copies issued from a background thread
    so they overlap device compute (the reference blocks on .cuda() copies
    every iteration, train.py:254-270)."""
    import queue as _queue
    import threading as _threading

    q: "_queue.Queue" = _queue.Queue(maxsize=max(1, depth))

    def transfer():
        try:
            for batch in batches:
                q.put(shard_batch(batch, mesh))
            q.put(None)
        except BaseException as e:
            q.put(e)

    thread = _threading.Thread(target=transfer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is None:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
