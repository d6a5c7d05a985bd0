"""Prototype: conv3x3 input-gradient as an im2col-of-g matmul.

XLA's conv_backprop_input for Cout=12 contracts per-tap K=12 (padded to
128) -> ~7% MXU. Instead: dx[p, ci] = sum_{ky,kx} g[y+ky-1, x+kx-1, f]
* w[ky, kx, ci, f] = im2col_g (P, 108) @ Wflat (108, Cin), where im2col_g
is built from 9 CONTIGUOUS shifts of g (pad+slice, no strides; ~3 ms/GB
HBM) and K = 108 is dense.
"""
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

DTYPE = jnp.bfloat16
SCAN_N = 8
OUTER_R = 4


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dx_ref(g, w, x_shape):
    x0 = jnp.zeros(x_shape, g.dtype)
    return jax.vjp(lambda xx: conv_ref(xx, w), x0)[1](g)[0]


def dx_im2col(g, w):
    """dx via im2col of the (small-channel) gradient."""
    b, h, w_, f = g.shape
    cin = w.shape[2]
    gpad = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # dx[y][x] sums g[y+dy, x+dx] * w[1-dy, 1-dx] for dy,dx in {-1,0,1}
    shifts = [gpad[:, ky:ky + h, kx:kx + w_, :]
              for ky in range(3) for kx in range(3)]
    gi = jnp.concatenate(shifts, axis=-1)               # (B, H, W, 9F)
    # wflat[(ky*3+kx)*F + f, ci] = w[2-ky, 2-kx, ci, f] (flipped kernel)
    wflip = w[::-1, ::-1]                                # (3,3,Cin,F)
    wflat = wflip.transpose(0, 1, 3, 2).reshape(9 * f, cin)
    return jax.lax.dot_general(gi, wflat, (((3,), (0,)), ((), ())))


@jax.jit
def run_ref(g, ws, x):
    def outer(_, s):
        def step(acc, w):
            return acc + dx_ref(g * (1 + 0 * s).astype(DTYPE), w, x.shape), None
        acc, _ = jax.lax.scan(step, jnp.zeros_like(x), ws)
        return jnp.sum(acc.astype(jnp.float32))
    return jax.lax.fori_loop(0, OUTER_R, outer, jnp.float32(0))


@jax.jit
def run_new(g, ws, x):
    def outer(_, s):
        def step(acc, w):
            return acc + dx_im2col(g * (1 + 0 * s).astype(DTYPE), w), None
        acc, _ = jax.lax.scan(step, jnp.zeros_like(x), ws)
        return jnp.sum(acc.astype(jnp.float32))
    return jax.lax.fori_loop(0, OUTER_R, outer, jnp.float32(0))


def timeit(fn, *args):
    float(fn(*args))
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / (OUTER_R * SCAN_N) * 1000.0


def main():
    rng = np.random.RandomState(0)
    # correctness (f32)
    x32 = jnp.asarray(rng.randn(2, 16, 32, 20), jnp.float32)
    w32 = jnp.asarray(rng.randn(3, 3, 20, 12) * 0.1, jnp.float32)
    g32 = jnp.asarray(rng.randn(2, 16, 32, 12), jnp.float32)
    ref = dx_ref(g32, w32, x32.shape)
    got = dx_im2col(g32, w32)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"parity max|err| = {err:.2e}", flush=True)
    assert err < 1e-4

    b = 16
    for (h, w_, cin, f, name) in [(256, 320, 48, 12, "db0.l0"),
                                  (256, 320, 144, 12, "dbu4.l0"),
                                  (256, 320, 180, 12, "dbu4.l3"),
                                  (128, 160, 96, 12, "db1.l0"),
                                  (128, 160, 228, 12, "dbu3.l3"),
                                  (256, 320, 192, 1, "finalConv1x1-as3x3-NA")]:
        if f == 1:
            continue
        x = jnp.zeros((b, h, w_, cin), DTYPE)
        ws = jnp.asarray(rng.randn(SCAN_N, 3, 3, cin, f) * 0.05, DTYPE)
        g = jnp.asarray(rng.randn(b, h, w_, f), DTYPE)
        t_ref = timeit(run_ref, g, ws, x)
        t_new = timeit(run_new, g, ws, x)
        fl = 2 * b * h * w_ * 9 * cin * f
        print(f"{name:10s} dx ref {t_ref:6.3f} ms ({fl/t_ref/1e9:5.1f} TF/s)"
              f"   im2col {t_new:6.3f} ms ({fl/t_new/1e9:5.1f} TF/s)"
              f"   speedup {t_ref/t_new:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
