"""Per-kernel device times of the block-engine Pallas kernels, per
FCDenseNet57 engine-eligible block config. Times each stage (fwd layers,
bwd1 layers, bwd2 layers, full fwd, full vjp) with a scanned loop and one
scalar readback (axon-relay-safe, see PERF.md)."""
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

# (name, c0, h, w) for the six engine-eligible FCDenseNet57 blocks @256x320
CONFIGS = [
    ("down0", 48, 256, 320),
    ("down1", 96, 128, 160),
    ("down2", 144, 64, 80),
    ("up2", 240, 64, 80),
    ("up3", 192, 128, 160),
    ("up4", 144, 256, 320),
]


def timed(fn, *args, iters=20):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    float(jnp.sum(out[0]).astype(jnp.float32)) if isinstance(out, tuple) else float(jnp.sum(out).astype(jnp.float32))

    def loop(args):
        def body(c, _):
            r = fn(*args)
            r0 = r[0] if isinstance(r, tuple) else r
            return c + jnp.sum(r0.astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)[0]

    loop_j = jax.jit(loop)
    float(loop_j(args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop_j(args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    rng = np.random.RandomState(0)
    total_f = total_b = total_ref = 0.0
    for name, c0, h, w in CONFIGS:
        x = jnp.asarray(rng.randn(B, h, w, c0).astype(np.float32)).astype(jnp.bfloat16)
        gammas = tuple(jnp.asarray(rng.rand(c0 + j * GROWTH).astype(np.float32) + 0.5) for j in range(NL))
        betas = tuple(jnp.asarray(rng.randn(c0 + j * GROWTH).astype(np.float32) * .1) for j in range(NL))
        kernels = tuple(jnp.asarray(rng.randn(3, 3, c0 + j * GROWTH, GROWTH).astype(np.float32) * .1) for j in range(NL))
        biases = tuple(jnp.asarray(rng.randn(GROWTH).astype(np.float32) * .1) for j in range(NL))
        dims = (GROWTH, NL, 1e-5, None)

        def fwd(x, g, bt, k, bi):
            return be.block_engine_apply(dims, x, g, bt, k, bi)

        def vjp(x, g, bt, k, bi):
            def loss(*a):
                buf, mu, m2 = be.block_engine_apply(dims, *a)
                return jnp.sum(buf.astype(jnp.float32))
            return jax.grad(loss, argnums=0)(x, g, bt, k, bi)

        def ref_vjp(x, g, bt, k, bi):
            def loss(*a):
                buf, mu, m2 = dense_block_apply(dims, *a)
                return jnp.sum(buf.astype(jnp.float32))
            return jax.grad(loss, argnums=0)(x, g, bt, k, bi)

        tf = timed(fwd, x, gammas, betas, kernels, biases)
        tv = timed(vjp, x, gammas, betas, kernels, biases)
        tr = timed(ref_vjp, x, gammas, betas, kernels, biases)
        total_f += tf
        total_b += tv
        total_ref += tr
        print(f"{name:6s} c0={c0:3d} {h}x{w}: engine fwd {tf:6.2f}  "
              f"engine fwd+bwd {tv:6.2f}  xla-buffered fwd+bwd {tr:6.2f} ms")
    print(f"TOTAL  engine fwd {total_f:.1f}  fwd+bwd {total_b:.1f}  "
          f"xla {total_ref:.1f} ms")


if __name__ == "__main__":
    main()
