"""High-res inference timing at the REAL bag_1 shape (512x576).

The round-5 helper bug blocks *training* compiles at 512x576 in this
environment (PERF.md round 5 #6), but forward-only programs compile
fine — this script measures the serving path at the shape real data
actually produces at --input_downsampling 2.0 (the dataset's own
64-divisible mask crop; reference dataset.py:36-113), batch 8
throughput and batch 1 latency, following bench.py's timing discipline
(scalar readback sync; chained iterations through the relay).

Run: python scripts/bench_infer_576.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from endoscopydepthestimation_pytorch_tpu import training
from endoscopydepthestimation_pytorch_tpu.models import FCDenseNet57

H, W = 512, 576
WARMUP, ITERS = 3, 30


def main():
    device = jax.devices()[0]
    model = FCDenseNet57(n_classes=1, dtype=jnp.bfloat16, packed=True)
    config = training.TrainConfig(lr_step_size=1000)
    state = training.create_train_state(
        model, jax.random.PRNGKey(0), (1, H, W, 3), config)
    predict = jax.jit(training.predict_step)

    rng = np.random.default_rng(0)
    colors = jax.device_put(
        jnp.asarray(rng.standard_normal((8, H, W, 3)), jnp.float32), device)
    boundary = jax.device_put(jnp.ones((8, H, W, 1), jnp.float32), device)

    out = {}
    for b in (8, 1):
        c, m = colors[:b], boundary[:b]
        for _ in range(WARMUP):
            depth = predict(state, c, m)
        float(jnp.sum(depth))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            depth = predict(state, c, m)
        float(jnp.sum(depth))
        dt = time.perf_counter() - t0
        out[f"infer_512x576_b{b}_ms"] = round(1000.0 * dt / ITERS, 2)
        out[f"infer_512x576_b{b}_fps"] = round(b * ITERS / dt, 2)
    out["device"] = str(device)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
