"""Feasibility A/B for int8 PTQ on the serving path: conv-level timings.

Question (PERF.md round-5 queue #4): does an int8 conv (int8 x int8 ->
int32, rescale) beat the bf16 conv on v5e at THIS model's shapes? The
v5e MXU peak doubles at int8 (~788 TOP/s vs 394 TF/s bf16), but the
growth-12 convs are N-padded and the step is bandwidth-bound, so the
win is not automatic — measure before building the PTQ apparatus.

Shapes: the model's conv population at 256x320 serving (batch 8) — the
fat first conv, growth-12 dense-layer convs at several depths, the
transition 1x1s, and the packed (space-to-depth) variants that serving
actually uses at this resolution.

Run on the real chip: python scripts/microbench_int8.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jnp.abs(x.astype(jnp.float32))))


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = sync(out)  # one scalar readback over the chained steps
    dt = (time.perf_counter() - t0) / iters * 1000
    return dt, s


def conv(x, w, stride=1, pad="SAME", acc=None):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    kw = {}
    if acc is not None:
        kw["preferred_element_type"] = acc
    return jax.lax.conv_general_dilated(x, w, (stride, stride), pad,
                                        dimension_numbers=dn, **kw)


def main():
    b, h, w = 8, 256, 320
    cases = [
        ("first3x3 3->48", (b, h, w, 3), (3, 3, 3, 48)),
        ("dense d0 48->12", (b, h, w, 48), (3, 3, 48, 12)),
        ("dense d2 168->12", (b, h // 4, w // 4, 168), (3, 3, 168, 12)),
        ("bneck 288->12", (b, h // 16, w // 16, 288), (3, 3, 288, 12)),
        ("trans1x1 108->108", (b, h, w, 108), (1, 1, 108, 108)),
        ("packed d0 432->96", (b, h // 2, w // 4, 48 * 9), (1, 1, 432, 96)),
    ]
    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}")
    for name, xs, ws in cases:
        kx, kw_ = jax.random.split(jax.random.fold_in(key, hash(name) % 2**31))
        xf = jax.random.normal(kx, xs, jnp.float32)
        wf = jax.random.normal(kw_, ws, jnp.float32) * 0.1

        f_bf16 = jax.jit(lambda x, w: conv(x, w))
        t_bf16, _ = timeit(f_bf16, xf.astype(jnp.bfloat16),
                           wf.astype(jnp.bfloat16))

        xi = jnp.clip(jnp.round(xf * 16), -127, 127).astype(jnp.int8)
        wi = jnp.clip(jnp.round(wf * 64), -127, 127).astype(jnp.int8)
        try:
            f_i8 = jax.jit(lambda x, w: conv(x, w, acc=jnp.int32))
            t_i8, _ = timeit(f_i8, xi, wi)
            i8 = f"{t_i8:7.3f} ms"
        except Exception as e:  # int conv may not lower on this backend
            t_i8, i8 = float("nan"), f"FAIL {type(e).__name__}: {e}"[:80]

        # the realistic PTQ op: dynamic-quantize act, int8 conv, rescale
        def ptq(x, w_q, w_scale):
            s = jnp.max(jnp.abs(x)) / 127.0
            xq = jnp.round(x / s).astype(jnp.int8)
            y = conv(xq, w_q, acc=jnp.int32)
            return y.astype(jnp.float32) * (s * w_scale)

        try:
            f_ptq = jax.jit(ptq)
            t_ptq, _ = timeit(f_ptq, xf.astype(jnp.bfloat16), wi,
                              jnp.float32(1 / 64))
            ptq_s = f"{t_ptq:7.3f} ms"
        except Exception as e:
            ptq_s = f"FAIL {type(e).__name__}"[:60]

        print(f"{name:22s} bf16 {t_bf16:7.3f} ms | int8 {i8} | ptq {ptq_s}")


if __name__ == "__main__":
    sys.exit(main())
