#!/bin/bash
# Round-4 hardware measurement sweep — run when the axon TPU relay
# answers (it hung on compute at round-4 resume). Targets VERDICT r3
# next-round items #1 (utilization hunt), #4 (grad-accum 512x640 A/B)
# and #8 (bench refresh incl. the stretch fields). Each step is bounded;
# partial results are fine — later sessions read /tmp/hw_sweep4/*.log.
set -x
mkdir -p /tmp/hw_sweep4
cd /root/repo

# 0. relay probe (fail fast if still down)
timeout 180 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float(jnp.sum(jnp.ones((128,128)))))" || exit 1

# 1. headline bench refresh — now also emits the 512x640 stretch fields
timeout 2400 python bench.py 2>&1 | tee /tmp/hw_sweep4/bench.log

# 2. grad-accum capacity lever at the stretch config: effective batch 8
#    via 2 microbatches of 4 (the config 'batch 8 + remat' OOMs at 20.6G).
#    Per-sample throughput compares against the b4 line from bench.
timeout 2400 python scripts/ab_step.py --hw 512 640 --batch 8 \
    --grad_accum 2 --remat --skip_default segmented_last_up \
    2>&1 | tee /tmp/hw_sweep4/ab_512_b8_ga2.log

# 3. grad-accum overhead at the canonical config (b8 = 2x4, 256x320):
#    quantifies the scan/accumulation tax vs the direct step
timeout 1800 python scripts/ab_step.py --grad_accum 2 segmented_last_up \
    2>&1 | tee /tmp/hw_sweep4/ab_256_ga2.log

# 4. utilization hunt: per-op ranking by roofline waste
#    (self-time x (1 - bw/819)) on the SHIPPED config
timeout 2400 python scripts/profile_step.py --per_op 30 \
    2>&1 | tee /tmp/hw_sweep4/profile_per_op.log

# 5. warp-kernel backward at the IN-MODEL shape (B=32 c=2 grad_first):
#    establishes the real in-model cost before any kernel rework
timeout 1200 python scripts/microbench_warp.py \
    2>&1 | tee /tmp/hw_sweep4/microbench_warp.log

# 6. XLA/libtpu compiler-flag sweep on the canonical step (cheap
#    utilization lever on a bandwidth-bound program)
timeout 3600 python scripts/ab_xla_flags.py \
    2>&1 | tee /tmp/hw_sweep4/ab_xla_flags.log
