"""Compile + parity-gate + bench the fused Pallas TinyCNN on the TPU.

Compares against the flax forward at the deployed bf16 setting, with the
torch CPU f32 logits as the accuracy oracle (same oracle as
bench_cnn_precision.py). Run: python scripts/bench_cnn_pallas.py
Env: DPC_B (batch, default 128), DPC_ITERS (default 20).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from distropointclouds_tpu.io import fixtures
from distropointclouds_tpu.models.tiny_cnn import TinyCNN
from distropointclouds_tpu.models.layers import normalize_minmax
from distropointclouds_tpu.models import torch_import
from distropointclouds_tpu.ops.cnn_pallas import tiny_cnn_pallas_forward
from bench_cnn_precision import torch_reference_logits

B = int(os.environ.get("DPC_B", "128"))
ITERS = int(os.environ.get("DPC_ITERS", "20"))


def bench(fwd, variables, batch):
    def fence(o):
        return float(jnp.sum(o[:, 0, 0]))

    out = np.asarray(fwd(variables, batch))
    fence(fwd(variables, batch))
    t0 = time.perf_counter()
    outs = [fwd(variables, batch) for _ in range(ITERS)]
    fence(outs[-1])
    dt = (time.perf_counter() - t0) / ITERS
    return out, dt


def main():
    print("devices:", jax.devices(), flush=True)
    ids = fixtures.GOLDEN_IDS
    scs = np.stack([fixtures.golden_descriptor(s).astype(np.float32) for s in ids])
    xs = np.asarray(normalize_minmax(jnp.asarray(scs)))
    ref = torch_reference_logits(xs)
    print("torch ref ready", flush=True)

    variables = torch_import.load_tiny_cnn()
    batch = jax.device_put(
        jnp.asarray(np.stack([xs[i % len(ids)] for i in range(B)]))
    )

    model = TinyCNN(dtype=jnp.bfloat16)
    flax_fwd = jax.jit(
        lambda v, x: model.apply(v, x[..., None], train=False)[..., 0]
    )
    out, dt = bench(flax_fwd, variables, batch)
    print(json.dumps({
        "impl": "flax_bf16",
        "us_per_scan": round(dt / B * 1e6, 1),
        "max_dlogit_vs_torch": float(np.abs(out[: len(ids)] - ref).max()),
    }), flush=True)

    pallas_fwd = jax.jit(
        lambda v, x: tiny_cnn_pallas_forward(v, x, use_pallas=True)[..., 0]
    )
    out, dt = bench(pallas_fwd, variables, batch)
    print(json.dumps({
        "impl": "pallas_bf16",
        "us_per_scan": round(dt / B * 1e6, 1),
        "max_dlogit_vs_torch": float(np.abs(out[: len(ids)] - ref).max()),
    }), flush=True)


if __name__ == "__main__":
    main()
