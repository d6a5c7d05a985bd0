"""Per-shape conv microbenchmark on the real TPU.

For every 3x3/1x1 conv shape in the FCDenseNet-57 train step (batch 16 =
two stacked 8-batches at 256x320), measure XLA's forward conv, input
gradient (dx) and filter gradient (dw) separately, so the Pallas conv
engine targets the measured hot spots rather than assumptions.

Each measurement scans SCAN_N independent weight instances inside ONE
jitted program (accumulating outputs so nothing is CSE'd/DCE'd) — this
removes the per-dispatch axon-relay overhead that dominates small convs
when launched one by one. Sync is a scalar readback (CLAUDE.md). All
arrays are explicit jit arguments (closed-over constants make compiles
pathologically slow).
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

SCAN_N = 16
OUTER_R = 8  # fori_loop repetitions around the scan: one dispatch + one
             # scalar readback measures OUTER_R * SCAN_N convs (~0.2 ms
             # relay floor per measurement instead of 1.6 ms)
DTYPE = jnp.bfloat16


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.jit
def run_fwd(x, ws):
    def outer(_, s):
        def step(acc, w):
            return acc + conv(x, w * (1 + 0 * s).astype(DTYPE)), None
        acc0 = jnp.zeros(x.shape[:3] + (ws.shape[-1],), DTYPE)
        acc, _ = jax.lax.scan(step, acc0, ws)
        return jnp.sum(acc.astype(jnp.float32))
    return jax.lax.fori_loop(0, OUTER_R, outer, jnp.float32(0))


@jax.jit
def run_dx(x, g, ws):
    def outer(_, s):
        def step(acc, w):
            dx = jax.vjp(lambda xx: conv(xx, w * (1 + 0 * s).astype(DTYPE)),
                         x)[1](g)[0]
            return acc + dx, None
        acc, _ = jax.lax.scan(step, jnp.zeros_like(x), ws)
        return jnp.sum(acc.astype(jnp.float32))
    return jax.lax.fori_loop(0, OUTER_R, outer, jnp.float32(0))


@jax.jit
def run_dw(x, g, ws):
    k0 = ws[0]

    def outer(_, s):
        def step(acc, w):
            gp = g + (w[0, 0, 0, 0] * (1 + 0 * s).astype(DTYPE)
                      ) * jnp.asarray(1e-6, DTYPE)
            dw = jax.vjp(lambda kk: conv(x, kk), k0)[1](gp)[0]
            return acc + dw, None
        acc, _ = jax.lax.scan(step, jnp.zeros_like(k0), ws)
        return jnp.sum(acc.astype(jnp.float32))
    return jax.lax.fori_loop(0, OUTER_R, outer, jnp.float32(0))


def timeit(fn, *args):
    float(fn(*args))
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / (OUTER_R * SCAN_N) * 1000.0


def main():
    shapes = [
        (256, 320, 3, 48, 3, "firstconv"),
        (256, 320, 48, 12, 3, "db0.l0"),
        (256, 320, 84, 12, 3, "db0.l3"),
        (256, 320, 96, 96, 1, "td0"),
        (128, 160, 96, 12, 3, "db1.l0"),
        (128, 160, 132, 12, 3, "db1.l3"),
        (128, 160, 144, 144, 1, "td1"),
        (64, 80, 144, 12, 3, "db2.l0"),
        (32, 40, 192, 12, 3, "db3.l0"),
        (16, 20, 240, 12, 3, "db4.l0"),
        (8, 10, 288, 12, 3, "bneck.l0"),
        (16, 20, 336, 12, 3, "dbu0.l0"),
        (32, 40, 288, 12, 3, "dbu1.l0"),
        (64, 80, 240, 12, 3, "dbu2.l0"),
        (128, 160, 192, 12, 3, "dbu3.l0"),
        (128, 160, 228, 12, 3, "dbu3.l3"),
        (256, 320, 144, 12, 3, "dbu4.l0"),
        (256, 320, 180, 12, 3, "dbu4.l3"),
        (256, 320, 48, 48, 3, "tu4"),
        (128, 160, 48, 48, 3, "tu3"),
        (256, 320, 192, 1, 1, "finalConv"),
    ]
    b = 16
    rng = np.random.RandomState(0)
    print(f"{'layer':12s} {'HxW':9s} {'Cin':4s} {'Cout':4s} "
          f"{'fwd ms':>7s} {'dx ms':>7s} {'dw ms':>7s} "
          f"{'fwd TF/s':>8s} {'dx TF/s':>8s} {'dw TF/s':>8s}", flush=True)
    tot = [0.0, 0.0, 0.0]
    for (h, w, cin, cout, kk, name) in shapes:
        x = jnp.asarray(rng.randn(b, h, w, cin), DTYPE)
        ws = jnp.asarray(rng.randn(SCAN_N, kk, kk, cin, cout) * 0.05, DTYPE)
        g = jnp.asarray(rng.randn(b, h, w, cout), DTYPE)

        t_fwd = timeit(run_fwd, x, ws)
        t_dx = timeit(run_dx, x, g, ws)
        t_dw = timeit(run_dw, x, g, ws)

        flops = 2 * b * h * w * kk * kk * cin * cout
        print(f"{name:12s} {h}x{w:<5d} {cin:4d} {cout:4d} "
              f"{t_fwd:7.3f} {t_dx:7.3f} {t_dw:7.3f} "
              f"{flops / t_fwd / 1e9:8.1f} {flops / t_dx / 1e9:8.1f} "
              f"{flops / t_dw / 1e9:8.1f}", flush=True)
        tot[0] += t_fwd; tot[1] += t_dx; tot[2] += t_dw
    print(f"{'TOTAL(uniq)':12s} {'':9s} {'':4s} {'':4s} "
          f"{tot[0]:7.3f} {tot[1]:7.3f} {tot[2]:7.3f}")


if __name__ == "__main__":
    main()
