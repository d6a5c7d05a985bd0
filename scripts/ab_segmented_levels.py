"""Scan segment-decomposition per level ON TOP of the shipped default
(segmented_last_up): time the canonical train step with ONE extra block
segment-decomposed at a time. Concats at ~170 GB/s are the top
inefficiency class of the bandwidth-bound step (PERF.md round-3 fusion
table); this finds which blocks' concats are worth virtualizing despite
the sub-128-lane conv penalty.

Usage: python scripts/ab_segmented_levels.py [--batch 8] [--hw 256 320]
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402
from endoscopydepthestimation_pytorch_tpu import training  # noqa: E402
from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57  # noqa: E402

LEVELS = (["denseBlocksDown%d" % i for i in range(5)] + ["bottleneck"]
          + ["denseBlocksUp%d" % i for i in range(4)])  # Up4 = last_up


def time_step(flags, batch, dclw, steps=10, hw=(256, 320)):
    model = FCDenseNet57(n_classes=1, dtype=jnp.bfloat16,
                         segmented_last_up=True, **flags)
    config = training.TrainConfig(lr_step_size=1000)
    state = training.create_train_state(model, jax.random.PRNGKey(0),
                                        (1,) + tuple(hw) + (3,), config)
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
    return best * 1e3


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 320))
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    bsz, hw = args.batch, tuple(args.hw)
    batch = {k: jax.device_put(jnp.asarray(v))
             for k, v in B.synthetic_batch(bsz, *hw).items()}
    dclw = jax.device_put(jnp.asarray(5.0, jnp.float32))

    base = time_step({}, batch, dclw, hw=hw)
    print(f"ship (last_up)   {base:7.1f} ms/step", flush=True)
    deltas = {}
    for lv in LEVELS:
        ms = time_step({"segmented_levels": (lv,)}, batch, dclw, hw=hw)
        deltas[lv] = ms - base
        print(f"+{lv:17s} {ms:7.1f} ms/step  delta {ms - base:+6.1f}",
              flush=True)
    winners = tuple(lv for lv in LEVELS if deltas[lv] < -1.0)
    if winners:
        ms = time_step({"segmented_levels": winners}, batch, dclw, hw=hw)
        print(f"winners {winners}")
        print(f"combined         {ms:7.1f} ms/step  delta {ms - base:+6.1f}",
              flush=True)


if __name__ == "__main__":
    main()
