"""Prototype: 3x3 conv as a rolled dense-K matmul (pure XLA, no Pallas).

Idea: pack DELTA=8 horizontal output positions into the matmul N dim
(Cout 12 -> 96) while keeping the contraction dense: build a rolled view
xp[b, y, g, j*C:(j+1)*C] = xpad[b, y, 8g+j, :] for j in 0..9 (10 strided
slices + concat -> 1.25x input bytes), then the conv is 3 row-shifted
matmuls (P, 10C) @ (10C, 96) accumulated. K = 30*Cin dense, N = 96:
~21% MXU bound vs ~5% for XLA's native small-Cout conv.

Measures fwd / dx / dw of the rolled formulation vs lax conv on the two
hottest shapes. Full autodiff (no custom VJP) to see what XLA makes of
the slice/concat transposes.
"""
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

DELTA = 8
DTYPE = jnp.bfloat16
SCAN_N = 8
OUTER_R = 4


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def pack_weights(w):
    """(3,3,C,F) -> (3, 10*C, 8*F): Wp[ky, j*C+ci, d*F+f] = w[ky, j-d, ci, f]
    for j-d in {0,1,2} (the 3-tap window of output position d)."""
    kh, kw, c, f = w.shape
    wp = jnp.zeros((3, (DELTA + 2) * c, DELTA * f), w.dtype)
    for d in range(DELTA):
        for kx in range(3):
            j = d + kx
            wp = wp.at[:, j * c:(j + 1) * c, d * f:(d + 1) * f].set(w[:, kx])
    return wp


def conv_rolled(x, wp, f):
    """3x3 SAME conv with pre-packed weights wp (3, 10C, 8F)."""
    b, h, w_, c = x.shape
    g = w_ // DELTA
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (B, H+2, W+2, C)
    # rolled view: 10 strided column slices, concat on channels
    cols = [jax.lax.slice(xpad, (0, 0, j, 0), (b, h + 2, j + DELTA * (g - 1) + 1, c),
                          (1, 1, DELTA, 1)) for j in range(DELTA + 2)]
    xp = jnp.concatenate(cols, axis=-1)         # (B, H+2, G, 10C)
    acc = None
    for ky in range(3):
        rows = jax.lax.slice(xp, (0, ky, 0, 0), (b, ky + h, g, (DELTA + 2) * c))
        part = jax.lax.dot_general(rows, wp[ky],
                                   (((3,), (0,)), ((), ())))
        acc = part if acc is None else acc + part   # (B, H, G, 8F)
    return acc.reshape(b, h, g, DELTA, f).reshape(b, h, w_, f)


@jax.jit
def run_fwd_ref(x, ws):
    def outer(_, s):
        def step(acc, w):
            return acc + conv_ref(x, w * (1 + 0 * s).astype(DTYPE)), None
        acc, _ = jax.lax.scan(step, jnp.zeros(x.shape[:3] + (ws.shape[-1],), DTYPE), ws)
        return jnp.sum(acc.astype(jnp.float32))
    return jax.lax.fori_loop(0, OUTER_R, outer, jnp.float32(0))


@partial(jax.jit, static_argnames=("f",))
def run_fwd_rolled(x, wps, f):
    def outer(_, s):
        def step(acc, wp):
            return acc + conv_rolled(x, wp * (1 + 0 * s).astype(DTYPE), f), None
        acc, _ = jax.lax.scan(step, jnp.zeros(x.shape[:3] + (f,), DTYPE), wps)
        return jnp.sum(acc.astype(jnp.float32))
    return jax.lax.fori_loop(0, OUTER_R, outer, jnp.float32(0))


@jax.jit
def run_vjp_ref(x, g, ws):
    def outer(_, s):
        def step(acc, w):
            out, vjp = jax.vjp(lambda xx, ww: conv_ref(xx, ww), x,
                               w * (1 + 0 * s).astype(DTYPE))
            dx, dw = vjp(g)
            return acc + jnp.sum(dx.astype(jnp.float32)) + jnp.sum(dw.astype(jnp.float32)) + jnp.sum(out.astype(jnp.float32)) * 0, None
        acc, _ = jax.lax.scan(step, jnp.float32(0), ws)
        return s + acc
    return jax.lax.fori_loop(0, OUTER_R, outer, jnp.float32(0))


@partial(jax.jit, static_argnames=("f",))
def run_vjp_rolled(x, g, wps, f):
    def outer(_, s):
        def step(acc, wp):
            out, vjp = jax.vjp(lambda xx, ww: conv_rolled(xx, ww, f), x,
                               wp * (1 + 0 * s).astype(DTYPE))
            dx, dw = vjp(g)
            return acc + jnp.sum(dx.astype(jnp.float32)) + jnp.sum(dw.astype(jnp.float32)) + jnp.sum(out.astype(jnp.float32)) * 0, None
        acc, _ = jax.lax.scan(step, jnp.float32(0), wps)
        return s + acc
    return jax.lax.fori_loop(0, OUTER_R, outer, jnp.float32(0))


def timeit(fn, *args, **kw):
    float(fn(*args, **kw))
    float(fn(*args, **kw))
    t0 = time.perf_counter()
    float(fn(*args, **kw))
    return (time.perf_counter() - t0) / (OUTER_R * SCAN_N) * 1000.0


def main():
    rng = np.random.RandomState(0)
    b = 16
    # correctness check on a small shape (f32 for tight tolerance)
    x32 = jnp.asarray(rng.randn(2, 16, 32, 20), jnp.float32)
    w32 = jnp.asarray(rng.randn(3, 3, 20, 12) * 0.1, jnp.float32)
    ref = conv_ref(x32, w32)
    got = conv_rolled(x32, pack_weights(w32), 12)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"parity max|err| = {err:.2e}", flush=True)
    assert err < 1e-4

    for (h, w_, cin, f, name) in [(256, 320, 48, 12, "db0.l0"),
                                  (256, 320, 144, 12, "dbu4.l0"),
                                  (256, 320, 180, 12, "dbu4.l3"),
                                  (128, 160, 96, 12, "db1.l0")]:
        x = jnp.asarray(rng.randn(b, h, w_, cin), DTYPE)
        ws = jnp.asarray(rng.randn(SCAN_N, 3, 3, cin, f) * 0.05, DTYPE)
        wps = jnp.stack([pack_weights(w) for w in ws])
        g = jnp.asarray(rng.randn(b, h, w_, f), DTYPE)

        t_ref_f = timeit(run_fwd_ref, x, ws)
        t_rol_f = timeit(run_fwd_rolled, x, wps, f=f)
        t_ref_v = timeit(run_vjp_ref, x, g, ws)
        t_rol_v = timeit(run_vjp_rolled, x, g, wps, f=f)
        fl = 2 * b * h * w_ * 9 * cin * f
        print(f"{name:10s} fwd ref {t_ref_f:6.3f} ms ({fl/t_ref_f/1e9:5.1f} TF/s)"
              f"  rolled {t_rol_f:6.3f} ms ({fl/t_rol_f/1e9:5.1f} TF/s)"
              f"  | fwd+vjp ref {t_ref_v:6.3f}  rolled {t_rol_v:6.3f}", flush=True)


if __name__ == "__main__":
    main()
