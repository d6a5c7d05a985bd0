"""Conv-backward microbenchmark: XLA adjoints vs dense-K im2col (real TPU).

NEGATIVE RESULT (round 2, recorded in PERF.md): the explicit tap-expanded
im2col backward (gy9 with K=108) measured ~0.55x of XLA's own conv
adjoints on the growth-12 shapes — XLA's TPU conv lowering already
performs the im2col internally, and the explicit gy9 materialization pays
10.7x lane-padding traffic on the 12-channel gradient (sub-128 channel
tensors are physically padded to 128 lanes; see scripts/layout_probe
numbers in PERF.md). Kept as the reproducible experiment.

Methodology as scripts/microbench_conv.py: SCAN_N weights scanned inside
one jitted program, OUTER_R fori repetitions, scalar-readback sync.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def _shift2d(x: jnp.ndarray, oy: int, ox: int) -> jnp.ndarray:
    """out[y, x] = x[y + oy, x + ox], zero-filled at the borders."""
    h, w = x.shape[1], x.shape[2]
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return x[:, 1 + oy:1 + oy + h, 1 + ox:1 + ox + w, :]


def tap_expand_grad(gy: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, F) -> (B, H, W, 9F): gy9[..., t*F+f] = gy[q - off_t, f]."""
    parts = []
    for ky in range(3):
        for kx in range(3):
            parts.append(_shift2d(gy, -(ky - 1), -(kx - 1)))
    return jnp.concatenate(parts, axis=-1)


def conv3x3_dx(gy: jnp.ndarray, w: jnp.ndarray,
               gy9: jnp.ndarray | None = None) -> jnp.ndarray:
    """Input gradient of y = conv3x3_SAME(x, w) as a dense-K matmul.

    gy: (B, H, W, F); w: (3, 3, C, F) in the forward's HWIO layout.
    Returns (B, H, W, C). Pass a precomputed ``gy9`` to share the tap
    expansion with :func:`conv3x3_dw`.
    """
    if gy9 is None:
        gy9 = tap_expand_grad(gy)
    c, f = w.shape[2], w.shape[3]
    # Wd[(ky*3+kx)*F + f, c] = w[ky, kx, c, f]
    wd = w.transpose(0, 1, 3, 2).reshape(9 * f, c).astype(gy9.dtype)
    return jax.lax.dot_general(
        gy9, wd, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(gy.dtype)


def conv3x3_dw(a: jnp.ndarray, gy: jnp.ndarray,
               gy9: jnp.ndarray | None = None) -> jnp.ndarray:
    """Filter gradient of y = conv3x3_SAME(a, w) as a tap-packed-N matmul.

    a: (B, H, W, C) forward input; gy: (B, H, W, F).
    Returns (3, 3, C, F) in f32.
    """
    if gy9 is None:
        gy9 = tap_expand_grad(gy)
    f = gy.shape[-1]
    c = a.shape[-1]
    # (C, 9F) = contract a against gy9 over batch and space
    dw = jax.lax.dot_general(
        a, gy9, (((0, 1, 2), (0, 1, 2)), ((), ())),
        preferred_element_type=jnp.float32)
    return dw.reshape(c, 3, 3, f).transpose(1, 2, 0, 3)


def conv3x3_grads(a: jnp.ndarray, gy: jnp.ndarray, w: jnp.ndarray):
    """(dx, dw) sharing one tap expansion of gy."""
    gy9 = tap_expand_grad(gy)
    return conv3x3_dx(gy, w, gy9), conv3x3_dw(a, gy, gy9)


SCAN_N = 16
OUTER_R = 8
DTYPE = jnp.bfloat16


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.jit
def run_xla(x, g, ws):
    def outer(_, s):
        def step(acc, w):
            gp = g + (w[0, 0, 0, 0] * (1 + 0 * s).astype(DTYPE)
                      ) * jnp.asarray(1e-6, DTYPE)
            dx = jax.vjp(lambda xx: conv(xx, w), x)[1](gp)[0]
            dw = jax.vjp(lambda kk: conv(x, kk), w)[1](gp)[0]
            return acc + jnp.sum(dx.astype(jnp.float32)) + jnp.sum(
                dw.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), ws)
        return acc
    return jax.lax.fori_loop(0, OUTER_R, outer, jnp.float32(0))


@jax.jit
def run_im2col(x, g, ws):
    def outer(_, s):
        def step(acc, w):
            gp = g + (w[0, 0, 0, 0] * (1 + 0 * s).astype(DTYPE)
                      ) * jnp.asarray(1e-6, DTYPE)
            dx, dw = conv3x3_grads(x, gp, w)
            return acc + jnp.sum(dx.astype(jnp.float32)) + jnp.sum(
                dw.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), ws)
        return acc
    return jax.lax.fori_loop(0, OUTER_R, outer, jnp.float32(0))


def timeit(fn, *args):
    float(fn(*args))
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / (OUTER_R * SCAN_N) * 1000.0


def main():
    shapes = [
        (256, 320, 48, 12, "db0.l0"),
        (256, 320, 84, 12, "db0.l3"),
        (128, 160, 96, 12, "db1.l0"),
        (128, 160, 132, 12, "db1.l3"),
        (64, 80, 144, 12, "db2.l0"),
        (32, 40, 192, 12, "db3.l0"),
        (16, 20, 240, 12, "db4.l0"),
        (8, 10, 288, 12, "bneck.l0"),
        (16, 20, 336, 12, "dbu0.l0"),
        (32, 40, 288, 12, "dbu1.l0"),
        (64, 80, 240, 12, "dbu2.l0"),
        (128, 160, 192, 12, "dbu3.l0"),
        (128, 160, 228, 12, "dbu3.l3"),
        (256, 320, 144, 12, "dbu4.l0"),
        (256, 320, 180, 12, "dbu4.l3"),
        (256, 320, 48, 48, "tu4"),
        (128, 160, 48, 48, "tu3"),
        (256, 320, 3, 48, "firstconv"),
    ]
    b = 16
    rng = np.random.RandomState(0)
    print(f"{'layer':11s} {'HxW':9s} {'Cin':4s} "
          f"{'xla ms':>8s} {'im2col ms':>10s} {'speedup':>8s} "
          f"{'im2col TF/s':>11s}", flush=True)
    tot = [0.0, 0.0]
    for (h, w, cin, cout, name) in shapes:
        x = jnp.asarray(rng.randn(b, h, w, cin), DTYPE)
        ws = jnp.asarray(rng.randn(SCAN_N, 3, 3, cin, cout) * 0.05, DTYPE)
        g = jnp.asarray(rng.randn(b, h, w, cout), DTYPE)
        t_xla = timeit(run_xla, x, g, ws)
        t_i2c = timeit(run_im2col, x, g, ws)
        flops = 2 * 2 * b * h * w * 9 * cin * cout  # dx + dw
        print(f"{name:11s} {h}x{w:<5d} {cin:4d} "
              f"{t_xla:8.3f} {t_i2c:10.3f} {t_xla / t_i2c:8.2f} "
              f"{flops / t_i2c / 1e9:11.1f}", flush=True)
        tot[0] += t_xla
        tot[1] += t_i2c
    print(f"{'TOTAL(uniq)':11s} {'':9s} {'':4s} {tot[0]:8.3f} {tot[1]:10.3f} "
          f"{tot[0] / tot[1]:8.2f}")


if __name__ == "__main__":
    main()
