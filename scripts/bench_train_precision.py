"""Measure the mixed-precision TRAINING speedup on the real TPU
(r2 VERDICT item 3's "measured number": TrainConfig.compute_dtype wires
bf16 activations through the train step — the TPU analog of trainer B's
CUDA AMP autocast+GradScaler path, train_sc_ped.py:365-386,515).

Times ONE jitted trainer-B train step (forward + focal loss + backward
+ AdamW update) at batch 16 on 160x720 heatmap targets, f32 vs bf16
compute, with the dispatch-all-then-fence-last discipline (docs/PERF.md:
per-output fetch loops measure the tunnel, not the chip).

Run: timeout 3600 python scripts/bench_train_precision.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

BATCH = int(os.environ.get("DPC_BENCH_BATCH", "16"))
ITERS = int(os.environ.get("DPC_BENCH_ITERS", "40"))


def measure(compute_dtype: str) -> float:
    from distropointclouds_tpu.core.config import TrainConfig
    from distropointclouds_tpu.pipeline import MODELS
    from distropointclouds_tpu.train.data import build_targets
    from distropointclouds_tpu.train.loop import init_state, make_train_step

    cfg = dataclasses.replace(
        TrainConfig.trainer_b(), batch_size=BATCH, compute_dtype=compute_dtype
    )
    model = MODELS[cfg.model](dtype=jnp.dtype(cfg.compute_dtype))
    rng = np.random.default_rng(0)
    batch = {
        "sc": jnp.asarray(rng.normal(size=(BATCH, 160, 720)).astype(np.float32)),
        "centers": jnp.asarray(
            rng.uniform(0, 150, size=(BATCH, 32, 2)).astype(np.float32)
        ),
        "boxes": jnp.zeros((BATCH, 32, 5), jnp.float32),
        "distance": jnp.zeros((BATCH, 32), jnp.float32),
        "num_cells": jnp.zeros((BATCH, 32), jnp.int32),
        "ped_valid": jnp.asarray(rng.random((BATCH, 32)) < 0.2),
        "sample_weight": jnp.ones((BATCH,), jnp.float32),
    }
    targets = jax.jit(lambda b: build_targets(b, cfg, rng=jax.random.PRNGKey(0)))(
        batch
    )
    state, tx = init_state(
        model, cfg, jax.random.PRNGKey(1), targets["x"][:1]
    )
    step = jax.jit(make_train_step(model, tx, cfg))

    cur, aux = step(state, targets)  # compile
    jax.block_until_ready(aux)
    float(jax.tree.leaves(aux)[0])
    # Fence every 5 steps: one tunnel RTT per 5 (amortized ~6 ms/step)
    # while keeping the dependent chain short — this backend executes
    # LONG unfenced dependent train-step chains pathologically in f32
    # (measured 14.5 s/step for a 40-deep chain vs 127 ms/step fenced;
    # bf16 chains are unaffected).
    t0 = time.perf_counter()
    for i in range(ITERS):
        cur, aux = step(cur, targets)
        if (i + 1) % 5 == 0:
            final = float(jax.tree.leaves(aux)[0])
    dt = time.perf_counter() - t0
    assert np.isfinite(final), final
    return dt / ITERS * 1e3  # ms/step


def main():
    f32 = measure("float32")
    bf16 = measure("bfloat16")
    out = {
        "train_step_ms_f32": round(f32, 2),
        "train_step_ms_bf16": round(bf16, 2),
        "speedup": round(f32 / bf16, 2),
        "batch": BATCH,
        "samples_per_s_bf16": round(BATCH / (bf16 / 1e3), 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "runs", "train_precision.json"), "w"
    ) as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
