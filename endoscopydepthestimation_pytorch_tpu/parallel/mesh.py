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
    if jax.process_count() > 1 and batch_size % n != 0:
        # Multi-host, trimming is not an option: the loader hands each
        # process batch/process_count contiguous rows, and
        # ``make_array_from_process_local_data`` needs every process's
        # local rows to equal its addressable shard rows — a trimmed mesh
        # (e.g. 2 hosts x 4 devices, batch 6 -> 6-device mesh wanting 4
        # rows from host 0 while its loader supplies 3) fails later with
        # an opaque shard-shape error. Fail clearly at startup instead.
        raise ValueError(
            f"multi-host: global batch_size {batch_size} must be divisible "
            f"by the global device count {n}")
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


def host_local(x) -> np.ndarray:
    """This host's rows of a (possibly multi-host) global array.

    Replicated arrays return one full copy; batch-sharded arrays return the
    process-local rows in batch order (the rows this host's loader fed in,
    since ``shard_batch`` preserves the row->device mapping). Single-process
    this equals ``np.asarray(x)``; multi-host, where ``np.asarray`` raises
    on non-fully-addressable arrays, this is the correct local view for
    visualization/logging.
    """
    if not hasattr(x, "addressable_shards"):
        return np.asarray(x)
    if x.is_fully_replicated:
        return np.asarray(x.addressable_data(0))
    shards = sorted(x.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def host_local_rows(x, process_index: int, local_rows: int) -> np.ndarray:
    """This host's ``local_rows`` batch rows of ``x``, whether the compiler
    returned it batch-sharded (``host_local`` already yields local rows) or
    replicated (slice this process's contiguous block — ``shard_batch``
    assembles the global batch in process order, so process p's rows are
    ``[p*local_rows, (p+1)*local_rows)``). Used for image outputs on
    display steps, whose output sharding is compiler-chosen."""
    out = host_local(x)
    if out.shape[0] != local_rows:
        out = out[process_index * local_rows:(process_index + 1) * local_rows]
    return out


def multihost_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Barrier through the coordination service (gRPC KV store).

    Used around first executions of collective programs: on loaded hosts
    compile-time skew between processes can exceed the Gloo rendezvous'
    hard 30 s deadline at the first cross-host collective; this barrier has
    a minutes-scale timeout. No-op single-process. (NOT
    ``sync_global_devices``, which is itself a Gloo collective and would
    hit the same 30 s deadline.)"""
    if jax.process_count() <= 1:
        return
    try:
        from jax._src import distributed
        client = distributed.global_state.client
        client.wait_at_barrier(name, timeout_ms)
    except (ImportError, AttributeError):
        # jax._src is private and can move between releases; degrade to the
        # public sync (which IS a Gloo/backend collective with its own
        # shorter deadline) instead of taking down every multi-host run
        import warnings
        warnings.warn(
            "multihost_barrier: jax._src.distributed API unavailable; "
            "falling back to multihost_utils.sync_global_devices "
            "(shorter rendezvous deadline)", RuntimeWarning)
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def replicate_state(state: training.TrainState, mesh: Mesh) -> training.TrainState:
    """Replicate parameters/optimizer state across the mesh.

    Multi-host: ``device_put`` cannot address other hosts' devices, so the
    replicated global arrays are assembled from each host's (identical)
    copy, like ``shard_batch`` does for the batch axis."""
    rep = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
            state)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def make_parallel_train_step(config: training.TrainConfig, mesh: Mesh,
                             with_images: bool = False, grad_accum: int = 1):
    """The jitted train step with explicit shardings: state replicated,
    batch split on the data axis. XLA turns the loss/grad reductions into
    ICI all-reduces; BatchNorm's batch-mean becomes a cross-replica mean
    (a strict improvement over DataParallel's per-replica BN stats —
    documented deviation). ``with_images`` adds the training-board image
    outputs (separate compiled program used only on display steps).
    ``grad_accum`` accumulates over row-strided microbatches (each device
    contributes to every microbatch, so the per-microbatch grad/BN psums
    still ride the full mesh — training.train_step docstring)."""
    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    # shardings by pytree prefix: whole state replicated, whole batch
    # sharded; image outputs (if any) come back batch-sharded per compiler
    return jax.jit(
        partial(training.train_step, config=config, with_images=with_images,
                grad_accum=grad_accum),
        in_shardings=(rep, shard, rep),
        donate_argnums=0)


def make_shardmap_train_step(config: training.TrainConfig, mesh: Mesh, model,
                             backend: Optional[str] = None):
    """The train step as an explicit per-shard program under shard_map.

    Why this exists next to ``make_parallel_train_step``: the Pallas warp
    kernel (ops/warp_pallas.py) is a per-chip program — under plain
    jit+shardings the sampler must fall back to the SPMD-partitionable XLA
    one-hot formulation on multi-chip meshes (~30% slower per chip).
    shard_map makes every chip run the single-chip program, so the Pallas
    kernel applies per shard; gradients/metrics are pmean'd explicitly, and
    BatchNorm batch statistics are psum'd across shards inside the model
    (flax ``axis_name``) to preserve the jit path's global-BN semantics.

    Numerics: identical math to ``make_parallel_train_step`` — only
    reduction ORDER differs (per-shard mean then cross-shard mean of equal
    shards), so results agree to float rounding, not bit-exactly.

    ``backend`` overrides the per-shard sampler backend (default: "pallas"
    on TPU, "auto" elsewhere) — tests force "pallas" in interpret mode on
    the CPU mesh to trace the exact program a multi-chip TPU would run.
    """
    axis = mesh.axis_names[0]
    forced_backend = backend
    apply_fn = model.clone(axis_name=axis).apply
    eps = config.zero_division_epsilon
    scalar_keys = ("sparse_flow_loss", "depth_consistency_loss",
                   "scale_std_1", "scale_std_2")

    def per_shard(params, batch_stats, batch, dclw):
        # Each shard is effectively single-chip: use the Pallas sampler on
        # TPU (dispatch happens at trace time — backend_scope is active
        # while this body is traced).
        from ..ops import gridsample
        backend = forced_backend or (
            "pallas" if jax.default_backend() == "tpu" else "auto")

        def loss_fn(p):
            d1, d2, new_stats = training._forward_pair(
                apply_fn, p, batch_stats, batch, train=True)
            loss, aux = training.compute_losses(
                d1, d2, batch, config.sfl_weight, dclw, eps)
            # differentiate the GLOBAL (pmean'd) loss, not the per-shard
            # loss: under vma-checked shard_map (jax >= 0.9) the gradient
            # of a per-shard scalar w.r.t. replicated params comes back as
            # the psum over every shard's own seed — axis_size times the
            # gradient of the global mean. Seeding the pmean'd loss makes
            # every parameter cotangent arrive replicated AND correctly
            # scaled, with no post-hoc rescaling contract to maintain
            # (guarded by test_sharding.py grad_norm parity assertions).
            return jax.lax.pmean(loss, axis), (new_stats, aux)

        with gridsample.backend_scope(backend):
            (loss, (new_stats, aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)

        # already replicated; the pmean only certifies that for out_specs
        grads = jax.lax.pmean(grads, axis)
        scalars = {k: jax.lax.pmean(aux[k], axis) for k in scalar_keys}
        # new_stats is already cross-shard identical (BN axis_name pmean);
        # the pmean below just certifies replication for out_specs=P()
        new_stats = jax.lax.pmean(new_stats, axis)
        return loss, grads, new_stats, scalars

    shard_fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P(), P()))

    def step(state, batch, dcl_weight):
        loss, grads, new_stats, scalars = shard_fn(
            state.params, state.batch_stats, batch, dcl_weight)
        return training.apply_gradients(state, loss, grads, new_stats, scalars)

    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(rep, shard, rep),
                   out_shardings=(rep, rep), donate_argnums=0)


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
