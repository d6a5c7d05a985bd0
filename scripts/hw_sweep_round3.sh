#!/bin/bash
# Round-3/4 hardware measurement sweep — run when the axon TPU relay is
# back (it was down for the act8 build; PERF.md round-4 queue items
# 1/2/3/4). Each step is bounded; partial results are fine — later
# sessions read /tmp/hw_sweep/*.log and update PERF.md.
set -x
mkdir -p /tmp/hw_sweep
cd /root/repo

# 0. relay probe (fail fast if still down)
timeout 180 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float(jnp.sum(jnp.ones((128,128)))))" || exit 1

# 1. headline bench refresh (queue #3)
timeout 1200 python bench.py 2>&1 | tee /tmp/hw_sweep/bench.log

# 2. act8 A/B at the canonical config, both backward modes (queue #4)
timeout 2400 python scripts/ab_step.py act8 act8_saved_buf \
    2>&1 | tee /tmp/hw_sweep/ab_act8_256.log

# 3. 512x640 stretch: remat baseline refresh + act8 at batch 4
timeout 2400 python scripts/ab_step.py --hw 512 640 --batch 4 --remat act8 \
    2>&1 | tee /tmp/hw_sweep/ab_512_b4.log

# 4. THE memory target: does act8 fit batch 8 at 512x640 (remat b8 OOMs
#    at 20.6G vs 15.75G)? skip_default because the default OOMs.
timeout 2400 python scripts/ab_step.py --hw 512 640 --batch 8 \
    --skip_default act8 2>&1 | tee /tmp/hw_sweep/ab_512_b8_act8.log

# 5. segmented_last_up at 512x640 (queue #1; up4's concat is 4x the
#    256x320 bytes) — baseline here is the --remat default from step 3
timeout 2400 python scripts/ab_step.py --hw 512 640 --batch 4 --remat \
    segmented_last_up 2>&1 | tee /tmp/hw_sweep/ab_512_seglastup.log

# 6. utilization hunt: top fusions of the default step (queue #2)
timeout 2400 python scripts/profile_step.py --per_op 25 \
    2>&1 | tee /tmp/hw_sweep/profile_per_op.log
