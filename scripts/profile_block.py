"""Trace ONE dense-block config through the block engine on the TPU and
print per-op device self-times — separates the three Pallas kernels from
the XLA prologue/epilogue (pack/unpack transposes, buf concat, weight
tables). Usage: python scripts/profile_block.py [name] [--vjp]
with name in {down0,down1,down2,up2,up3,up4} (default down0).
"""
import argparse
import glob
import shutil
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
from endoscopydepthestimation_pytorch_tpu.ops import block_engine as be  # noqa: E402

GROWTH, NL, B = 12, 4, 16
CONFIGS = {
    "down0": (48, 256, 320),
    "down1": (96, 128, 160),
    "down2": (144, 64, 80),
    "up2": (240, 64, 80),
    "up3": (192, 128, 160),
    "up4": (144, 256, 320),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?", default="down0")
    ap.add_argument("--vjp", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trace_dir", default="/tmp/jtrace_block")
    args = ap.parse_args()
    c0, h, w = CONFIGS[args.name]

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, h, w, c0).astype(np.float32)).astype(jnp.bfloat16)
    gammas = tuple(jnp.asarray(rng.rand(c0 + j * GROWTH).astype(np.float32) + 0.5) for j in range(NL))
    betas = tuple(jnp.asarray(rng.randn(c0 + j * GROWTH).astype(np.float32) * .1) for j in range(NL))
    kernels = tuple(jnp.asarray(rng.randn(3, 3, c0 + j * GROWTH, GROWTH).astype(np.float32) * .1) for j in range(NL))
    biases = tuple(jnp.asarray(rng.randn(GROWTH).astype(np.float32) * .1) for j in range(NL))
    dims = (GROWTH, NL, 1e-5, None)
    argv = (x, gammas, betas, kernels, biases)

    def step(s, x, g, bt, k, bi):
        xx = x + s.astype(x.dtype)  # not loop-invariant
        if args.vjp:
            def loss(*a):
                buf, mu, m2 = be.block_engine_apply(dims, *a)
                return (jnp.sum(buf.astype(jnp.float32))
                        + jnp.sum(mu) + jnp.sum(m2))
            outs = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(xx, g, bt, k, bi)
        else:
            outs = be.block_engine_apply(dims, xx, g, bt, k, bi)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(outs))

    def loop(argv):
        def body(c, s):
            return c + step(s, *argv), None
        return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jnp.arange(args.iters, dtype=jnp.float32))[0]

    loop_j = jax.jit(loop)
    float(loop_j(argv))  # compile + warm

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    with jax.profiler.trace(args.trace_dir):
        float(loop_j(argv))

    import json

    from xprof.convert import raw_to_tool_data as rtd
    files = glob.glob(f"{args.trace_dir}/plugins/profile/*/*.xplane.pb")
    data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    tbl = json.loads(data.decode() if isinstance(data, bytes) else data)
    tbl = tbl[0] if isinstance(tbl, list) else tbl
    cols = [c["id"] for c in tbl["cols"]]
    i_type, i_self = cols.index("type"), cols.index("total_self_time")
    i_occ = cols.index("occurrences")
    i_host = cols.index("host_or_device")
    i_op = cols.index("operation") if "operation" in cols else i_type
    agg = {}
    for row in tbl["rows"]:
        c = row["c"]
        if c[i_host]["v"] != "Device":
            continue
        key = (c[i_type]["v"], str(c[i_op]["v"])[:48])
        agg.setdefault(key, [0.0, 0])
        agg[key][0] += float(c[i_self]["v"])
        agg[key][1] += int(c[i_occ]["v"])
    total = sum(v[0] for v in agg.values())
    print(f"{args.name} {'vjp' if args.vjp else 'fwd'}: device total "
          f"{total / 1e3 / args.iters:.2f} ms/iter")
    for (typ, op), (us, occ) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"  {us / 1e3 / args.iters:7.3f} ms  {typ:18s} {op}  x{occ}")


if __name__ == "__main__":
    main()
