"""512x640 stretch-config scaling analysis on the virtual 8-device mesh.

Compiles the data-parallel train step (bf16 + remat, per-device batch 4 —
the measured single-chip config, PERF.md: 462.7 ms/step) over an 8-way
mesh, extracts the collective traffic from the compiled HLO, executes one
reduced-spatial step to prove the sharded program runs, and prints the
ICI-roofline scaling efficiency estimate for a real v5e-8 slice.

Run: python scripts/scale_512.py   (self-bootstraps the CPU mesh)
"""
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def bootstrap():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["SCALE512_INNER"] = "1"
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                          env=env, capture_output=True, text=True)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr[-2000:] if proc.returncode else "")
    sys.exit(proc.returncode)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, ROOT)
    import bench as B
    from endoscopydepthestimation_pytorch_tpu import training
    from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57
    from endoscopydepthestimation_pytorch_tpu.parallel import (
        make_mesh, make_parallel_train_step, replicate_state, shard_batch)

    n = 8
    mesh = make_mesh(jax.devices()[:n])
    config = training.TrainConfig(lr_step_size=10)
    model = FCDenseNet57(n_classes=1, dtype=jnp.bfloat16, remat=True,
                         axis_name=None)
    state = training.create_train_state(model, jax.random.PRNGKey(0),
                                        (1, 512, 640, 3), config)
    state = replicate_state(state, mesh)
    step = make_parallel_train_step(config, mesh)

    # ---- compile the REAL 512x640 global-batch-32 step; count collectives
    batch32 = {k: np.asarray(v) for k, v in
               B.synthetic_batch(32, 512, 640).items()}
    sharded = shard_batch(batch32, mesh)
    dclw = jnp.asarray(5.0, jnp.float32)
    lowered = step.lower(state, sharded, dclw)
    comp = lowered.compile()
    hlo = comp.as_text()

    # Count the collectives the backend actually emitted. (The CPU
    # backend lowers the gradient sync to collective-permute chains, not
    # the all-reduce a TPU would run — so the efficiency estimate below
    # uses the backend-independent analytic payload, 2(N-1)/N * grad
    # bytes for a ring all-reduce, not these op counts.)
    import collections
    DT = {"f32": 4, "bf16": 2, "f16": 2, "u32": 4, "s32": 4, "pred": 1}
    agg = collections.Counter()
    byts = collections.Counter()
    for m_ in re.finditer(
            r"= (\w+)\[([0-9,]*)\][^\n]*? (all-reduce|all-gather|"
            r"reduce-scatter|all-to-all|collective-permute)\(", hlo):
        dt, dims, op = m_.group(1), m_.group(2), m_.group(3)
        size = 1
        for d in dims.split(","):
            if d:
                size *= int(d)
        agg[op] += 1
        byts[op] += size * DT.get(dt, 4)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"512x640 b4/device x8 mesh: compiled ok; collectives emitted: "
          f"{dict(agg)} ({sum(byts.values()) / 1e6:.1f} MB payload; "
          f"{n_params / 1e6:.2f}M params)")

    # ring all-reduce of f32 grads moves 2(N-1)/N * bytes over ICI;
    # v5e ICI ~45 GB/s per direction per link
    ici_bw = 45e9
    grad_bytes = n_params * 4
    t_ici = 2 * (n - 1) / n * grad_bytes / ici_bw
    step_ms = 462.7  # measured single-chip step at this config (PERF.md)
    eff = step_ms / (step_ms + t_ici * 1e3)
    print(f"ICI roofline: {grad_bytes / 1e6:.1f} MB f32 grads -> all-reduce "
          f"{t_ici * 1e3:.2f} ms vs {step_ms} ms compute -> DP scaling "
          f"efficiency {eff * 100:.2f}% "
          f"({32 / step_ms * 1e3 * eff:.1f} samples/s on a v5e-8)")

    # ---- execute one step at reduced spatial size to prove the program runs
    small = {k: np.asarray(v) for k, v in
             B.synthetic_batch(32, 128, 160).items()}
    state_s = training.create_train_state(model, jax.random.PRNGKey(0),
                                          (1, 128, 160, 3), config)
    state_s = replicate_state(state_s, mesh)
    state_s, metrics = step(state_s, shard_batch(small, mesh), dclw)
    print(f"executed sharded step (b32 over 8 devices): "
          f"loss={float(metrics['loss']):.5f}")


if __name__ == "__main__":
    if os.environ.get("SCALE512_INNER") != "1" or "axon" in os.environ.get(
            "JAX_PLATFORMS", ""):
        bootstrap()
    else:
        main()
