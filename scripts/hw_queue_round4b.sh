#!/bin/bash
# Round-4b TPU queue: split_skip A/B + scoped-vmem validation + bench.
# Run AFTER the extended flag sweep frees the chip. Partial results fine;
# logs land in /tmp/hw_sweep4/.
set -x
mkdir -p /tmp/hw_sweep4
cd /root/repo

# 1. the decisive split_skip A/B at the canonical config (vs the shipped
#    segmented_last_up, which is what it would replace)
timeout 2400 python scripts/ab_step.py --skip_default \
    segmented_last_up split_skip \
    2>&1 | tee /tmp/hw_sweep4/ab_split_skip_256.log

# 2. same at the 512x640 stretch config (up4's concat is 4x the bytes)
timeout 2400 python scripts/ab_step.py --hw 512 640 --batch 4 --remat \
    --skip_default segmented_last_up split_skip \
    2>&1 | tee /tmp/hw_sweep4/ab_split_skip_512.log

# 3. f32 numerics check for the scoped-vmem flag: the bf16 loss deviates
#    in the 2nd digit under the flag (rounding order); round-3 precedent
#    says f32 losses are bit-stable across fusion changes — verify that
#    holds under the flag before shipping it as a default.
timeout 1800 python - <<'EOF' 2>&1 | tee /tmp/hw_sweep4/vmem_f32_base.log
import jax, time
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
import bench as B
from endoscopydepthestimation_pytorch_tpu import training
from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57
model = FCDenseNet57(n_classes=1, dtype=jnp.float32, remat=True,
                     segmented_last_up=True)
config = training.TrainConfig(lr_step_size=1000,
                              compute_dtype=jnp.float32)
state = training.create_train_state(model, jax.random.PRNGKey(0),
                                    (1, 256, 320, 3), config)
batch = {k: jax.device_put(jnp.asarray(v))
         for k, v in B.synthetic_batch(8, 256, 320).items()}
dclw = jax.device_put(jnp.asarray(5.0, jnp.float32))
step = training.make_jit_train_step(config)
for i in range(4):
    state, m = step(state, batch, dclw)
    print("f32 loss step", i, repr(float(m["loss"])))
EOF

LIBTPU_INIT_ARGS="--xla_tpu_scoped_vmem_limit_kib=32768" \
timeout 1800 python - <<'EOF' 2>&1 | tee /tmp/hw_sweep4/vmem_f32_flag.log
import jax, time
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
import bench as B
from endoscopydepthestimation_pytorch_tpu import training
from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57
model = FCDenseNet57(n_classes=1, dtype=jnp.float32, remat=True,
                     segmented_last_up=True)
config = training.TrainConfig(lr_step_size=1000,
                              compute_dtype=jnp.float32)
state = training.create_train_state(model, jax.random.PRNGKey(0),
                                    (1, 256, 320, 3), config)
batch = {k: jax.device_put(jnp.asarray(v))
         for k, v in B.synthetic_batch(8, 256, 320).items()}
dclw = jax.device_put(jnp.asarray(5.0, jnp.float32))
step = training.make_jit_train_step(config)
for i in range(4):
    state, m = step(state, batch, dclw)
    print("f32 loss step", i, repr(float(m["loss"])))
EOF

# 4. the stretch config must still compile+run under the vmem flag
#    (bigger tensors -> bigger fusion working sets)
LIBTPU_INIT_ARGS="--xla_tpu_scoped_vmem_limit_kib=32768" \
timeout 2400 python scripts/ab_step.py --hw 512 640 --batch 4 --remat \
    --skip_default segmented_last_up \
    2>&1 | tee /tmp/hw_sweep4/vmem_512_compile.log

# 5. grad-accum eff-b8 under the flag too (the other shipped config)
LIBTPU_INIT_ARGS="--xla_tpu_scoped_vmem_limit_kib=32768" \
timeout 2400 python scripts/ab_step.py --hw 512 640 --batch 8 \
    --grad_accum 2 --remat --skip_default segmented_last_up \
    2>&1 | tee /tmp/hw_sweep4/vmem_512_ga2.log

# 6. per-op profile of the 512x640 stretch step (never profiled; grounds
#    the stretch number's own floor analysis)
timeout 2400 python scripts/profile_step.py --hw 512 640 --batch 4 \
    --remat --per_op 20 2>&1 | tee /tmp/hw_sweep4/profile_512.log
