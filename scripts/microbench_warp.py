"""Microbench the Pallas warp kernel fwd / fwd+bwd on the model's real
shape (warp_depth: B=16 stacked, 256x320, c=1). Run on the TPU.

Sync via scalar readback (the axon relay does not honor
block_until_ready); each timing chains N calls and reads one scalar.
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from endoscopydepthestimation_pytorch_tpu.ops import warp_pallas  # noqa: E402

B, H, W = 16, 256, 320
key = jax.random.PRNGKey(0)
img = jax.random.normal(key, (B, H, W, 1), jnp.float32)
px = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W), jnp.float32,
                        -2.0, W + 1.0)
py = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W), jnp.float32,
                        -2.0, H + 1.0)


N = 20


@jax.jit
def fwd_n(img, px, py):
    def body(acc, i):
        o = warp_pallas.grid_sample_pallas(img + acc * 1e-20, px, py)
        return jnp.sum(o), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(N))
    return acc


@jax.jit
def fwdbwd_n(img, px, py):
    def f(im, xx, yy):
        return jnp.sum(jnp.sin(warp_pallas.grid_sample_pallas(im, xx, yy)))

    def body(acc, i):
        l, g = jax.value_and_grad(f, argnums=(0, 1, 2))(img + acc * 1e-20, px, py)
        return l + jnp.sum(g[1]), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(N))
    return acc


def timeit(fn):
    float(fn(img, px, py))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(img, px, py))
        best = min(best, (time.perf_counter() - t0) / N * 1e3)
    return best


B2, C2 = 32, 2  # the in-model shape: both warp directions stacked, c=2
img2 = jax.random.normal(key, (B2, H, W, C2), jnp.float32)
px2 = jax.random.uniform(jax.random.PRNGKey(3), (B2, H, W), jnp.float32,
                         -2.0, W + 1.0)
py2 = jax.random.uniform(jax.random.PRNGKey(4), (B2, H, W), jnp.float32,
                         -2.0, H + 1.0)


@jax.jit
def model_fwd_n(img, px, py):
    def body(acc, i):
        o = warp_pallas.grid_sample_pallas(img + acc * 1e-20, px, py,
                                           grad_first_only=True)
        return jnp.sum(o), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(N))
    return acc


@jax.jit
def model_fwdbwd_n(img, px, py):
    def f(im, xx, yy):
        return jnp.sum(jnp.sin(warp_pallas.grid_sample_pallas(
            im, xx, yy, grad_first_only=True)))

    def body(acc, i):
        l, g = jax.value_and_grad(f, argnums=(0, 1, 2))(
            img + acc * 1e-20, px + acc * 1e-20, py + acc * 1e-20)
        return l + jnp.sum(g[1]) + jnp.sum(g[2]), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(N))
    return acc


def timeit2(fn):
    float(fn(img2, px2, py2))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(img2, px2, py2))
        best = min(best, (time.perf_counter() - t0) / N * 1e3)
    return best


if __name__ == "__main__":
    mf = timeit2(model_fwd_n)
    mfb = timeit2(model_fwdbwd_n)
    print(f"IN-MODEL shape (B=32 c=2 grad_first): fwd {mf:.2f} ms   "
          f"fwd+bwd {mfb:.2f} ms   bwd-only ~{mfb - mf:.2f} ms")
    f = timeit(fwd_n)
    fb = timeit(fwdbwd_n)
    print(f"c=1 B=16: fwd {f:.2f} ms   fwd+bwd {fb:.2f} ms   "
          f"bwd-only ~{fb - f:.2f} ms")
