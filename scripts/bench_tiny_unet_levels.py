"""Per-level TinyUNet timing: where does the detecting regime's model
cost actually sit, and how far from MXU speed-of-light is each level?

The r3 bench attributes the detecting regime (~2.4-2.9 ms/scan) to the
MODEL (TinyUNet ~1.1M params, docs/PERF.md "Detecting-regime
attribution"). This probe splits that cost by UNet level and pairs each
with its conv FLOPs so the MXU-utilization profile is explicit:
encoder levels are small-N (N=Cout<=128 lanes idle below 128), decoder
levels run fat concat contractions (K up to 3456, N=128+) that should
engage the MXU properly. If the decoder dominates at LOW util, there
is headroom worth chasing; if util is high or the encoder's
shape-bound levels dominate, the regime is at its architectural
ceiling like TinyCNN (docs/PERF.md "Fused Pallas CNN").

Timing discipline per CLAUDE.md: dispatch all iterations, fence ONE
scalar from the last output; per-level numbers are only meaningful
above the ~1-1.5 ms host-dispatch floor, so iterate each level enough
to dominate it.

Run on the TPU (default backend): python scripts/bench_tiny_unet_levels.py
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
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

B = int(os.environ.get("DPC_LVL_BATCH", "32"))
ITERS = int(os.environ.get("DPC_LVL_ITERS", "30"))
DTYPE = jnp.bfloat16 if os.environ.get("DPC_LVL_DTYPE", "bf16") == "bf16" else jnp.float32


def conv_flops(h, w, cin, cout, k=3):
    return 2 * h * w * k * k * cin * cout


def fence(x):
    # force completion: fetch one scalar (block_until_ready can return
    # early on this backend, CLAUDE.md)
    return float(jnp.asarray(x).ravel()[0])


def time_fn(fn, *args):
    out = fn(*args)
    fence(out)  # compile + sanity
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    from distropointclouds_tpu.models.tiny_unet import DoubleConv, TinyUNet, Up

    rng = jax.random.PRNGKey(0)
    levels = [
        # name, module, input shapes (NHWC), flops per SAMPLE
        ("inc", DoubleConv(32, dtype=DTYPE), [(B, 160, 720, 1)],
         conv_flops(160, 720, 1, 32) + conv_flops(160, 720, 32, 32)),
        ("d1", DoubleConv(64, dtype=DTYPE), [(B, 80, 360, 32)],
         conv_flops(80, 360, 32, 64) + conv_flops(80, 360, 64, 64)),
        ("d2", DoubleConv(128, dtype=DTYPE), [(B, 40, 180, 64)],
         conv_flops(40, 180, 64, 128) + conv_flops(40, 180, 128, 128)),
        ("d3", DoubleConv(256, dtype=DTYPE), [(B, 20, 90, 128)],
         conv_flops(20, 90, 128, 256) + conv_flops(20, 90, 256, 256)),
        ("u2", Up(128, dtype=DTYPE), [(B, 20, 90, 256), (B, 40, 180, 128)],
         conv_flops(40, 180, 384, 128) + conv_flops(40, 180, 128, 128)),
        ("u1", Up(64, dtype=DTYPE), [(B, 40, 180, 128), (B, 80, 360, 64)],
         conv_flops(80, 360, 192, 64) + conv_flops(80, 360, 64, 64)),
        ("u0", Up(32, dtype=DTYPE), [(B, 80, 360, 64), (B, 160, 720, 32)],
         conv_flops(160, 720, 96, 32) + conv_flops(160, 720, 32, 32)),
    ]

    results = {}
    total_level_us = 0.0
    for name, mod, shapes, flops in levels:
        xs = [
            jax.random.normal(jax.random.fold_in(rng, i), s, DTYPE)
            for i, s in enumerate(shapes)
        ]
        variables = mod.init(rng, *xs)
        fn = jax.jit(lambda v, *a, _m=mod: _m.apply(v, *a))
        us_per_scan = time_fn(fn, variables, *xs) / B * 1e6
        tflops = flops / (us_per_scan * 1e-6) / 1e12
        results[name] = {
            "us_per_scan": round(us_per_scan, 1),
            "gflop_per_scan": round(flops / 1e9, 2),
            "tflops": round(tflops, 1),
        }
        total_level_us += us_per_scan
        print(name, json.dumps(results[name]))

    # Whole model for comparison (level sum vs fused total).
    model = TinyUNet(dtype=DTYPE)
    x = jax.random.normal(rng, (B, 160, 720, 1), DTYPE)
    variables = model.init(rng, x)
    fn = jax.jit(lambda v, a: model.apply(v, a))
    full_us = time_fn(fn, variables, x) / B * 1e6
    results["_full_model"] = {"us_per_scan": round(full_us, 1)}
    results["_level_sum"] = {"us_per_scan": round(total_level_us, 1)}
    print("full", json.dumps(results["_full_model"]),
          "level_sum", json.dumps(results["_level_sum"]))
    out = os.path.join(os.path.dirname(__file__), "..", "runs",
                       "tiny_unet_levels.json")
    with open(out, "w") as f:
        json.dump({"batch": B, "dtype": str(DTYPE.__name__ if hasattr(DTYPE, '__name__') else DTYPE), "iters": ITERS, "levels": results}, f, indent=2)
    print("wrote", os.path.abspath(out))


if __name__ == "__main__":
    main()
