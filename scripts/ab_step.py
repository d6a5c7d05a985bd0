"""A/B the canonical train step across model flags on the attached TPU.

Usage: python scripts/ab_step.py [--hw H W] [--batch N] [--remat] [flag ...]
Always times the default first, then each named flag variant.
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


def time_step(flags, batch, dclw, steps=10, hw=(256, 320), remat=False,
              grad_accum=1):
    model = FCDenseNet57(n_classes=1, dtype=jnp.bfloat16, remat=remat, **flags)
    config = training.TrainConfig(lr_step_size=1000)
    state = training.create_train_state(model, jax.random.PRNGKey(0),
                                        (1,) + tuple(hw) + (3,), config)
    step_fn = training.make_jit_train_step(config, grad_accum=grad_accum)
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
    return best * 1e3, float(m["loss"])


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 320))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="gradient-accumulation microbatches (the 512x640 "
                         "effective-b8 capacity lever: --batch 8 "
                         "--grad_accum 2 --remat)")
    ap.add_argument("--skip_default", action="store_true",
                    help="time only the named flag variants (e.g. when the "
                         "default config OOMs at the chosen batch/hw and "
                         "the variant is the one that fits, like act8 at "
                         "512x640 batch 8)")
    ap.add_argument("flags", nargs="*", default=[])
    args = ap.parse_args()
    bsz, hw = args.batch, tuple(args.hw)
    batch = {k: jax.device_put(jnp.asarray(v))
             for k, v in B.synthetic_batch(bsz, *hw).items()}
    dclw = jax.device_put(jnp.asarray(5.0, jnp.float32))
    if not args.skip_default:
        ms, loss = time_step({}, batch, dclw, hw=hw, remat=args.remat,
                             grad_accum=args.grad_accum)
        sps = bsz / ms * 1e3
        print(f"default        {ms:7.1f} ms/step  {sps:6.1f} samples/s  loss {loss:.5f}")
    for f in args.flags:
        if f == "act8_saved_buf":
            # pseudo-flag: act8 with the whole-buffer fp8 backward
            # (ops/act8.py BWD_MODE) instead of the input-replay default
            from endoscopydepthestimation_pytorch_tpu.ops import act8
            act8.BWD_MODE = "saved_buf"
            flags = {"act8": True}
        elif f == "split_skip":
            # pseudo-flag: the shipped segmented_last_up config plus the
            # unconcatenated [up, skip] segment input to up4
            flags = {"segmented_last_up": True, "split_last_skip": True}
        else:
            flags = {f: True}
        ms, loss = time_step(flags, batch, dclw, hw=hw, remat=args.remat,
                             grad_accum=args.grad_accum)
        sps = bsz / ms * 1e3
        print(f"{f:14s} {ms:7.1f} ms/step  {sps:6.1f} samples/s  loss {loss:.5f}")


if __name__ == "__main__":
    main()
