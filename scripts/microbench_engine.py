"""Per-block device times of the block-engine Pallas kernels vs the XLA
buffered path, for each FCDenseNet57 engine-eligible block config.

Anti-hoist/DCE discipline follows microbench_conv.py: the scanned step
perturbs the input with the (otherwise unused) scan element so the body
is not loop-invariant, grads are taken w.r.t. EVERY argument, and all
outputs fold into the scalar carry. Sync is a scalar readback.
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
from endoscopydepthestimation_pytorch_tpu.ops import block_engine as be  # noqa: E402
from endoscopydepthestimation_pytorch_tpu.ops.dense_block import (  # noqa: E402
    dense_block_apply)

GROWTH, NL = 12, 4
B = 16
ITERS = 10

CONFIGS = [
    ("down0", 48, 256, 320),
    ("down1", 96, 128, 160),
    ("down2", 144, 64, 80),
    ("up2", 240, 64, 80),
    ("up3", 192, 128, 160),
    ("up4", 144, 256, 320),
]


def timed(step, args):
    def loop(args):
        def body(c, s):
            out = step(s, *args)
            return c + sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves(out)), None
        return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jnp.arange(ITERS, dtype=jnp.float32))[0]

    loop_j = jax.jit(loop)
    float(loop_j(args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop_j(args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3


def main():
    rng = np.random.RandomState(0)
    totals = [0.0, 0.0, 0.0, 0.0]
    for name, c0, h, w in CONFIGS:
        x = jnp.asarray(rng.randn(B, h, w, c0).astype(np.float32)).astype(jnp.bfloat16)
        gammas = tuple(jnp.asarray(rng.rand(c0 + j * GROWTH).astype(np.float32) + 0.5) for j in range(NL))
        betas = tuple(jnp.asarray(rng.randn(c0 + j * GROWTH).astype(np.float32) * .1) for j in range(NL))
        kernels = tuple(jnp.asarray(rng.randn(3, 3, c0 + j * GROWTH, GROWTH).astype(np.float32) * .1) for j in range(NL))
        biases = tuple(jnp.asarray(rng.randn(GROWTH).astype(np.float32) * .1) for j in range(NL))
        dims = (GROWTH, NL, 1e-5, None)
        args = (x, gammas, betas, kernels, biases)

        def fwd_of(apply_fn):
            def step(s, x, g, bt, k, bi):
                xx = x * (1 + 0 * s).astype(x.dtype)
                return apply_fn(dims, xx, g, bt, k, bi)
            return step

        def vjp_of(apply_fn):
            def step(s, x, g, bt, k, bi):
                xx = x * (1 + 0 * s).astype(x.dtype)

                def loss(*a):
                    buf, mu, m2 = apply_fn(dims, *a)
                    return (jnp.sum(buf.astype(jnp.float32))
                            + jnp.sum(mu) + jnp.sum(m2))
                return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
                    xx, g, bt, k, bi)
            return step

        res = [timed(fwd_of(be.block_engine_apply), args),
               timed(vjp_of(be.block_engine_apply), args),
               timed(fwd_of(dense_block_apply), args),
               timed(vjp_of(dense_block_apply), args)]
        for i, v in enumerate(res):
            totals[i] += v
        print(f"{name:6s} c0={c0:3d} {h}x{w}: engine fwd {res[0]:6.2f} "
              f"fwd+bwd {res[1]:6.2f} | xla fwd {res[2]:6.2f} "
              f"fwd+bwd {res[3]:6.2f} ms")
    print(f"TOTAL: engine fwd {totals[0]:.1f} fwd+bwd {totals[1]:.1f} | "
          f"xla fwd {totals[2]:.1f} fwd+bwd {totals[3]:.1f} ms")


if __name__ == "__main__":
    main()
