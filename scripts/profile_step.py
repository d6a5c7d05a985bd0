"""Trace the canonical train step on the attached TPU and print a per-op-
class device-time breakdown (the table PERF.md's round-2 sections cite).

Usage: python scripts/profile_step.py [--steps 5] [--fused|--segmented|
--buffered] [--batch 8] [--hw 256 320]

Aggregates the xprof "framework_op_stats" for the traced region and prints
ms/step per op class (conv, concatenate, add_any, reduce, pallas, ...).
"""
import argparse
import glob
import json
import shutil
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 320))
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--segmented", action="store_true")
    ap.add_argument("--buffered", action="store_true")
    ap.add_argument("--block_packed", action="store_true")
    ap.add_argument("--block_engine", action="store_true")
    ap.add_argument("--act8", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--segmented_last_up", action=argparse.BooleanOptionalAction,
                    default=True, help="profile the shipped configuration "
                    "(bench.py passes segmented_last_up=True)")
    ap.add_argument("--trace_dir", default="/tmp/jtrace_step")
    ap.add_argument("--per_op", type=int, default=0, metavar="N",
                    help="also print the top-N individual fusions by device "
                         "self-time (the utilization-hunt ranking: the gap "
                         "to the bandwidth roofline is spread over ~150 "
                         "fusions — PERF.md round-4 queue #2)")
    args = ap.parse_args()

    import bench as B
    from endoscopydepthestimation_pytorch_tpu import training
    from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57

    model = FCDenseNet57(n_classes=1, dtype=jnp.bfloat16, fused=args.fused,
                         segmented=args.segmented, buffered=args.buffered,
                         block_packed=args.block_packed,
                         block_engine=args.block_engine, act8=args.act8,
                         remat=args.remat,
                         segmented_last_up=args.segmented_last_up)
    config = training.TrainConfig(lr_step_size=1000)
    state = training.create_train_state(
        model, jax.random.PRNGKey(0), (1,) + tuple(args.hw) + (3,), config)
    batch = {k: jax.device_put(jnp.asarray(v))
             for k, v in B.synthetic_batch(args.batch, *args.hw).items()}
    dclw = jax.device_put(jnp.asarray(5.0, jnp.float32))
    step_fn = training.make_jit_train_step(config)

    for _ in range(3):
        state, m = step_fn(state, batch, dclw)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step_fn(state, batch, dclw)
    float(m["loss"])
    wall = (time.perf_counter() - t0) / args.steps

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            state, m = step_fn(state, batch, dclw)
        float(m["loss"])

    from xprof.convert import raw_to_tool_data as rtd
    files = glob.glob(f"{args.trace_dir}/plugins/profile/*/*.xplane.pb")
    data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    tbl = json.loads(data.decode() if isinstance(data, bytes) else data)
    tbl = tbl[0] if isinstance(tbl, list) else tbl
    cols = [c["id"] for c in tbl["cols"]]
    i_type, i_self = cols.index("type"), cols.index("total_self_time")
    i_occ = cols.index("occurrences")
    i_host = cols.index("host_or_device")
    agg = {}
    for row in tbl["rows"]:
        c = row["c"]
        if c[i_host]["v"] != "Device":
            continue
        typ = c[i_type]["v"]
        agg.setdefault(typ, [0.0, 0])
        agg[typ][0] += float(c[i_self]["v"])
        agg[typ][1] += int(c[i_occ]["v"])
    total = sum(v[0] for v in agg.values())
    print(f"wall {wall*1e3:.1f} ms/step; device total "
          f"{total/1e3/args.steps:.1f} ms/step")
    for typ, (us, occ) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:18]:
        print(f"{typ:40s} {us/1e3/args.steps:8.2f} ms/step  x{occ}")

    if args.per_op:
        name_col = next((c for c in ("operation", "name", "op_name")
                         if c in cols), None)
        if name_col is None:
            print(f"(no per-op name column; available: {cols})")
            return
        i_name = cols.index(name_col)
        # measured-bandwidth column (GB/s) lets us rank by wasted ms:
        # self_time * (1 - measured_bw / peak_bw)
        i_bw = next((cols.index(c) for c in
                     ("measured_memory_bw", "memory_bw", "bandwidth")
                     if c in cols), None)
        i_bound = cols.index("bound_by") if "bound_by" in cols else None
        PEAK_GBS = 819.0  # v5e HBM
        ops = {}
        for row in tbl["rows"]:
            c = row["c"]
            if c[i_host]["v"] != "Device":
                continue
            key = (c[i_name]["v"], c[i_type]["v"])
            ops.setdefault(key, [0.0, 0, 0.0, ""])
            ops[key][0] += float(c[i_self]["v"])
            ops[key][1] += int(c[i_occ]["v"])
            if i_bw is not None:
                try:
                    # time-weighted mean bandwidth across occurrences
                    ops[key][2] += float(c[i_bw]["v"]) * float(c[i_self]["v"])
                except (TypeError, ValueError):
                    pass
            if i_bound is not None:
                ops[key][3] = c[i_bound]["v"]
        ranked = sorted(ops.items(), key=lambda kv: -kv[1][0])
        total_waste = 0.0
        rows = []
        for (name, typ), (us, occ, bw_w, bound) in ranked:
            ms = us / 1e3 / args.steps
            gbs = bw_w / us if us else 0.0
            waste = ms * max(0.0, 1 - gbs / PEAK_GBS) if gbs else 0.0
            total_waste += waste
            rows.append((ms, occ, typ, gbs, waste, bound, name))
        print(f"\ntotal roofline waste across all fusions: "
              f"{total_waste:.1f} ms/step (sum of self_time x "
              f"(1 - bw/{PEAK_GBS:.0f}GB/s))")
        print(f"top {args.per_op} fusions by device self-time:")
        for ms, occ, typ, gbs, waste, bound, name in rows[:args.per_op]:
            print(f"{ms:8.3f} ms/step  x{occ:<4d} {typ:22s} {gbs:6.0f} GB/s "
                  f"waste {waste:6.3f} ms  {bound[:12]:12s} {name[:70]}")
        print(f"\ntop {args.per_op} fusions by roofline waste:")
        for ms, occ, typ, gbs, waste, bound, name in sorted(
                rows, key=lambda r: -r[4])[:args.per_op]:
            print(f"{waste:8.3f} ms waste  {ms:7.3f} ms  x{occ:<4d} "
                  f"{typ:22s} {gbs:6.0f} GB/s {bound[:12]:12s} {name[:64]}")


if __name__ == "__main__":
    main()
