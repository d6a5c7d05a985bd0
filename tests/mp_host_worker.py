"""Worker for the 2-process multi-host test (tests/test_sharding.py).

Each process owns 2 virtual CPU devices (4 global), initializes the
distributed runtime over localhost, feeds its LOCAL half of a deterministic
global batch through ``shard_batch`` (the ``make_array_from_process_local_data``
branch, parallel/mesh.py), and runs ONE jitted train step on the 4-device
mesh. Prints the (replicated) loss; the parent asserts both processes agree
with each other and with the single-process result.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main(process_id: int, port: str) -> None:
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=process_id)
    assert jax.process_count() == 2 and jax.device_count() == 4

    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from endoscopydepthestimation_pytorch_tpu import training
    from endoscopydepthestimation_pytorch_tpu.models import UNet
    from endoscopydepthestimation_pytorch_tpu.parallel import (
        make_mesh, make_parallel_train_step, replicate_state, shard_batch)
    from test_training import _synthetic_batch

    config = training.TrainConfig(lr_step_size=50)
    model = UNet(out_channels=1)
    state = training.create_train_state(model, jax.random.PRNGKey(0),
                                        (1, 32, 32, 3), config)
    mesh = make_mesh()

    full = _synthetic_batch(batch=8, h=32, w=32)
    # this host's slice of the global batch (4 samples of 8)
    local = {k: v[process_id * 4:(process_id + 1) * 4] for k, v in full.items()}
    device_batch = shard_batch(local, mesh)
    assert device_batch["color_1"].shape[0] == 8  # global shape reassembled

    state = replicate_state(state, mesh)
    step_fn = make_parallel_train_step(config, mesh)
    # AOT-compile, then barrier through the coordination service (generous
    # timeout) before the first execution: the Gloo rendezvous at the first
    # cross-host collective has a hard 30 s deadline, which compile-time
    # skew between the two processes (sharing one CPU core) can exceed
    dclw = jnp.asarray(0.1)
    compiled = step_fn.lower(state, device_batch, dclw).compile()
    # coordination-service barrier (gRPC KV store, minutes-scale timeout) —
    # NOT sync_global_devices, which is itself a Gloo collective and would
    # hit the same 30 s rendezvous deadline
    from jax._src import distributed
    distributed.global_state.client.wait_at_barrier("compiled", 600_000)
    state, metrics = compiled(state, device_batch, dclw)
    print(f"MPLOSS {process_id} {float(metrics['loss']):.8f} "
          f"{float(metrics['grad_norm']):.6f}", flush=True)

    if len(sys.argv) > 3:
        # the multi-process checkpoint contract (train.py validation
        # epochs): EVERY process calls save — orbax coordinates internally
        # (sync_global_processes) and a main-only call deadlocks process 0
        # — and only the primary host's directory materializes
        from endoscopydepthestimation_pytorch_tpu.utils import (
            checkpoint as ckpt)
        path = os.path.join(sys.argv[3], f"p{process_id}", "ckpt")
        ckpt.save_checkpoint(path, state, epoch=1, validation_loss=0.5)
        wrote = os.path.isdir(path) and bool(os.listdir(path))
        print(f"MPSAVE {process_id} {int(wrote)}", flush=True)
        # leave together (train.py's train_done): an early exit starts the
        # runtime's Shutdown barrier, whose deadline kills a slower peer
        distributed.global_state.client.wait_at_barrier("done", 600_000)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
