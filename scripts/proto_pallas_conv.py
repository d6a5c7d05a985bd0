"""Measure the round-1 Pallas tap-accumulation conv at several Cin, plus
a matmul-only Pallas kernel with the same loop structure to find the MXU
ceiling for this shape. Decides the round-2 conv engine design.
"""
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from endoscopydepthestimation_pytorch_tpu.ops import conv_pallas

SCAN_N = 8
OUTER_R = 4


def timeit(fn, *args):
    r = fn(*args); jax.tree.leaves(r)[0]
    float(jnp.sum(jax.tree.leaves(fn(*args))[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    float(jnp.sum(jax.tree.leaves(fn(*args))[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) * 1000.0


def bench_conv_pallas(b, h, w, cin, cout=12):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.float32)
    wp = conv_pallas.pack_tap_weights(wk)

    @jax.jit
    def run(x, wp):
        def outer(_, s):
            def step(acc, _w):
                return acc + conv_pallas.conv3x3_small_cout(
                    x * (1 + 0 * s).astype(x.dtype), wp), None
            acc, _ = jax.lax.scan(step, jnp.zeros(x.shape[:3] + (cout,),
                                                  jnp.float32),
                                  jnp.arange(SCAN_N))
            return jnp.sum(acc)
        return jax.lax.fori_loop(0, OUTER_R, outer, jnp.float32(0))

    float(run(x, wp)); float(run(x, wp))
    t0 = time.perf_counter()
    float(run(x, wp))
    ms = (time.perf_counter() - t0) / (OUTER_R * SCAN_N) * 1000.0
    fl = 2 * b * h * w * 9 * cin * cout
    print(f"conv_pallas r1  {h}x{w} Cin={cin:3d}: {ms:6.3f} ms "
          f"({fl/ms/1e9:5.1f} TF/s)", flush=True)


def bench_matmul_ceiling(m, k, n, taps):
    """Matmul-only kernel: `taps` accumulated (m,k)@(k,n) per grid step,
    mimicking the tap loop without the data plumbing."""
    def kern(a_ref, b_ref, o_ref):
        acc = jnp.zeros((m, n), jnp.float32)
        for t in range(taps):
            acc = acc + jnp.dot(a_ref[...], b_ref[t],
                                preferred_element_type=jnp.float32)
        o_ref[...] = acc

    grid = 16

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, m, k), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((taps, k, n), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, m, n), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid, m, n), jnp.float32),
        )(a, b)

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(grid, m, k), jnp.float32)
    bm = jnp.asarray(rng.randn(taps, k, n) * 0.05, jnp.float32)

    @jax.jit
    def loop(a, bm):
        def outer(_, s):
            def step(acc, _w):
                return acc + jnp.sum(run(a * (1 + 0 * s), bm)[0, 0]), None
            acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(SCAN_N))
            return acc
        return jax.lax.fori_loop(0, OUTER_R, outer, jnp.float32(0))

    float(loop(a, bm)); float(loop(a, bm))
    t0 = time.perf_counter()
    float(loop(a, bm))
    ms = (time.perf_counter() - t0) / (OUTER_R * SCAN_N) * 1000.0
    fl = 2 * grid * taps * m * k * n
    print(f"matmul-only M={m} K={k} N={n} taps={taps} grid={grid}: "
          f"{ms:6.3f} ms ({fl/ms/1e9:6.1f} TF/s mxu-slots)", flush=True)


if __name__ == "__main__":
    for cin in (48, 96, 144):
        bench_conv_pallas(16, 256, 320, cin)
    # the tap loop's MXU ceiling at the prototype's shapes (f32)
    bench_matmul_ceiling(640, 128, 96, 30)
    bench_matmul_ceiling(640, 128, 128, 30)
    bench_matmul_ceiling(1280, 128, 128, 30)
    bench_matmul_ceiling(640, 256, 96, 30)
