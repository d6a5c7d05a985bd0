"""Sweep XLA/libtpu compiler flags on the canonical train step (TPU).

Each variant runs in a subprocess (XLA flags bind at backend init). The
child times the default FCDenseNet57 bf16 step (the bench.py config) and
prints one line; the parent tabulates vs the no-flag baseline.

Usage: python scripts/ab_xla_flags.py [--hw 256 320] [--batch 8] [--steps 10]
"""
import argparse
import os
import subprocess
import sys

CHILD = r"""
import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import bench as B
from endoscopydepthestimation_pytorch_tpu import training
from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57

batch_n, h, w, steps = (int(x) for x in sys.argv[1:5])
model = FCDenseNet57(n_classes=1, dtype=jnp.bfloat16, segmented_last_up=True)
config = training.TrainConfig(lr_step_size=1000)
state = training.create_train_state(model, jax.random.PRNGKey(0),
                                    (1, h, w, 3), config)
batch = {k: jax.device_put(jnp.asarray(v))
         for k, v in B.synthetic_batch(batch_n, h, w).items()}
dclw = jax.device_put(jnp.asarray(5.0, jnp.float32))
step_fn = training.make_jit_train_step(config)
for _ in range(3):
    state, m = step_fn(state, batch, dclw)
float(m["loss"])
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, batch, dclw)
    float(m["loss"])
    best = min(best, (time.perf_counter() - t0) / steps)
print(f"RESULT {best*1e3:.2f} {float(m['loss']):.6f}")
"""

VARIANTS = [
    ("baseline", ""),
    ("scoped_vmem_32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("scoped_vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("scoped_vmem_96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("no_latency_sched", "--xla_tpu_enable_latency_hiding_scheduler=false"),
    ("no_rwb_fusion", "--xla_tpu_rwb_fusion=false"),
    ("licm_inflate_10", "--xla_tpu_licm_size_inflation_ratio=10"),
    ("flash_vmem", "--xla_tpu_enable_flash_attention=false"),
]

# Round-4 extended sweep: finer scoped-vmem scan (32M won, 64M failed to
# compile), fusion/scheduling/MSA knobs, and combos with the 32M winner.
# Unknown flag names fail the child at backend init and are reported
# FAILED — cheap negative signals, by design.
VARIANTS_EXT = [
    ("baseline", ""),
    ("scoped_vmem_24m", "--xla_tpu_scoped_vmem_limit_kib=24576"),
    ("scoped_vmem_40m", "--xla_tpu_scoped_vmem_limit_kib=40960"),
    ("scoped_vmem_48m", "--xla_tpu_scoped_vmem_limit_kib=49152"),
    ("scoped_vmem_56m", "--xla_tpu_scoped_vmem_limit_kib=57344"),
    ("dot_strength_red", "--xla_tpu_enable_dot_strength_reduction=false"),
    ("dot_dot_fusion", "--xla_tpu_dot_dot_fusion=true"),
    ("nested_loop_fusion",
     "--xla_tpu_enable_multi_level_nested_loop_fusion=true"),
    ("aggressive_bcast",
     "--xla_tpu_enable_aggressive_broadcast_priority_update=true"),
    ("msa_repeated_inst",
     "--xla_tpu_use_repeated_instance_for_preferred_prefetch_time=true"),
    ("copy_bw_scale_2",
     "--xla_tpu_async_copy_bandwidth_scaling_factor=2.0"),
    ("copy_bw_scale_05",
     "--xla_tpu_async_copy_bandwidth_scaling_factor=0.5"),
    ("vmem32_no_latency",
     "--xla_tpu_scoped_vmem_limit_kib=32768 "
     "--xla_tpu_enable_latency_hiding_scheduler=false"),
    ("vmem32_licm10",
     "--xla_tpu_scoped_vmem_limit_kib=32768 "
     "--xla_tpu_licm_size_inflation_ratio=10"),
    ("vmem32_copybw2",
     "--xla_tpu_scoped_vmem_limit_kib=32768 "
     "--xla_tpu_async_copy_bandwidth_scaling_factor=2.0"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 320))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--extra", nargs="*", default=[],
                    help="additional raw flag strings to try (each its own "
                         "variant; quote whole string)")
    ap.add_argument("--ext", action="store_true",
                    help="run the round-4 extended variant list instead")
    args = ap.parse_args()
    base = VARIANTS_EXT if args.ext else VARIANTS
    variants = base + [(f"extra{i}", f) for i, f in enumerate(args.extra)]

    base_ms = None
    for name, flags in variants:
        env = dict(os.environ)
        if flags:
            # xla_tpu_* flags are libtpu flags — the local XLA_FLAGS parser
            # rejects them; they bind through LIBTPU_INIT_ARGS only
            env["LIBTPU_INIT_ARGS"] = flags
        out = subprocess.run(
            [sys.executable, "-c", CHILD, str(args.batch), str(args.hw[0]),
             str(args.hw[1]), str(args.steps)],
            capture_output=True, text=True, timeout=900, env=env)
        line = next((ln for ln in out.stdout.splitlines()
                     if ln.startswith("RESULT")), None)
        if line is None:
            err = (out.stderr or "").strip().splitlines()
            print(f"{name:20s} FAILED: {err[-1] if err else out.returncode}")
            continue
        ms = float(line.split()[1])
        if base_ms is None:
            base_ms = ms
        print(f"{name:20s} {ms:8.2f} ms/step  ({ms - base_ms:+6.2f} vs "
              f"baseline)  loss {line.split()[2]}")


if __name__ == "__main__":
    main()
