"""TPU speed: fused Pallas dense conv vs XLA BN+ReLU+conv, fwd and fwd+bwd.

Straight-line chains inside one jit (NOT scan — custom calls inside scan
hit a ~0.9 ms per-iteration sync floor through the axon relay that
overlaps compute and corrupts small measurements)."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from endoscopydepthestimation_pytorch_tpu.ops import dense_conv

DTYPE = jnp.bfloat16
CHAIN = 24


def xla_layer(x, scale, shift, w):
    a = jnp.maximum(x * scale + shift, 0.0).astype(DTYPE)
    return jax.lax.conv_general_dilated(
        a, w.astype(DTYPE), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def make_chain(layer_fn, cin, f):
    """CHAIN layers chained through a scalar perturbation of `scale`
    (cheap data dependency; no large intermediates kept live)."""
    def run(x, scale, shift, w):
        t = jnp.float32(0)
        for k in range(CHAIN):
            y = layer_fn(x, scale * (1 + t * 1e-30), shift, w)
            t = t + jnp.mean(y.astype(jnp.float32))
        return t
    return jax.jit(run)


def make_chain_grad(layer_fn, cin, f):
    def run(x, scale, shift, w):
        def loss(w_):
            t = jnp.float32(0)
            for k in range(CHAIN):
                y = layer_fn(x, scale * (1 + t * 1e-30), shift, w_)
                t = t + jnp.mean(y.astype(jnp.float32))
            return t
        return jax.grad(loss)(w).sum()
    return jax.jit(run)


def timeit(fn, *args):
    float(fn(*args)); float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / CHAIN * 1000.0


def main():
    rng = np.random.RandomState(0)
    b = 16
    for (h, w_, cin, name) in [(256, 320, 48, "db0.l0"),
                               (256, 320, 84, "db0.l3"),
                               (128, 160, 96, "db1.l0"),
                               (128, 160, 132, "db1.l3"),
                               (128, 160, 228, "dbu3.l3"),
                               (256, 320, 144, "dbu4.l0"),
                               (256, 320, 180, "dbu4.l3"),
                               (64, 80, 144, "db2.l0")]:
        f = 12
        x = jnp.asarray(rng.randn(b, h, w_, cin), DTYPE)
        wk = jnp.asarray(rng.randn(3, 3, cin, f) * 0.05, jnp.float32)
        scale = jnp.asarray(rng.rand(cin) + 0.5, jnp.float32)
        shift = jnp.asarray(rng.randn(cin) * 0.3, jnp.float32)

        fl = 2 * b * h * w_ * 9 * cin * f
        t_x = timeit(make_chain(xla_layer, cin, f), x, scale, shift, wk)
        t_p = timeit(make_chain(dense_conv.fused_dense_conv, cin, f),
                     x, scale, shift, wk)
        t_xg = timeit(make_chain_grad(xla_layer, cin, f), x, scale, shift, wk)
        t_pg = timeit(make_chain_grad(dense_conv.fused_dense_conv, cin, f),
                      x, scale, shift, wk)
        print(f"{name:9s} {h}x{w_:<4d} C={cin:3d}: "
              f"fwd xla {t_x:6.3f} pallas {t_p:6.3f} ({t_x/t_p:4.2f}x, "
              f"{fl/t_p/1e9:5.1f} TF/s) | f+b xla {t_xg:6.3f} "
              f"pallas {t_pg:6.3f} ({t_xg/t_pg:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
