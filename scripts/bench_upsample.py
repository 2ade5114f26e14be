"""Bilinear-upsample probe: dense interpolation matmul vs 2-tap lerp.

The r4 TinyUNet level probe (runs/tiny_unet_levels.json) put u0 at
827.8 us/scan and u1 at 339.2 — together 58% of the level sum. Both
levels start with `upsample_bilinear_align_corners`, implemented as
TWO DENSE einsums against f32 interpolation matrices. At u0's shape the
sector matrix is 720x360 with 2 nonzeros/row: ~10.6 GFLOP/sample of
99.4%-zero matmul, and the f32 matrix promotes the bf16 activations to
f32 for the whole upsample. align_corners bilinear is exactly a 2-tap
lerp (`(1-f)*x[lo] + f*x[lo+1]`, static indices), so the same math is
~0.1% of the FLOPs as two static gathers + one fma.

Run on the TPU (default backend): python scripts/bench_upsample.py
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

B = int(os.environ.get("DPC_UP_BATCH", "32"))
ITERS = int(os.environ.get("DPC_UP_ITERS", "50"))


def interp_matrix(n_in, n_out):
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (src - lo).astype(np.float32)
    A = np.zeros((n_out, n_in), np.float32)
    A[np.arange(n_out), lo] += 1.0 - frac
    A[np.arange(n_out), hi] += frac
    return jnp.asarray(A)


def up_matmul(x, scale=2):
    Bn, H, W, C = x.shape
    Ah = interp_matrix(H, H * scale)
    Aw = interp_matrix(W, W * scale)
    x = jnp.einsum("ph,bhwc->bpwc", Ah, x)
    x = jnp.einsum("qw,bhwc->bhqc", Aw, x)
    return x


def _taps(n_in, n_out, dtype):
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (src - lo).astype(np.float32)
    return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(frac, dtype)


def up_lerp(x, scale=2):
    Bn, H, W, C = x.shape
    dt = x.dtype
    lo, hi, f = _taps(H, H * scale, dt)
    f = f[None, :, None, None]
    x = jnp.take(x, lo, axis=1) * (1 - f) + jnp.take(x, hi, axis=1) * f
    lo, hi, f = _taps(W, W * scale, dt)
    f = f[None, None, :, None]
    x = jnp.take(x, lo, axis=2) * (1 - f) + jnp.take(x, hi, axis=2) * f
    return x


def fence(x):
    return float(jnp.asarray(x).ravel()[0])


def time_fn(fn, x):
    out = fn(x)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(x)
    fence(out)
    return (time.perf_counter() - t0) / ITERS / B * 1e6  # us/scan


def main():
    rng = jax.random.PRNGKey(0)
    shapes = {
        "u2_in": (B, 20, 90, 256),
        "u1_in": (B, 40, 180, 128),
        "u0_in": (B, 80, 360, 64),
    }
    results = {}
    for name, shape in shapes.items():
        for dt in (jnp.bfloat16, jnp.float32):
            x = jax.random.normal(rng, shape, dt)
            m = time_fn(jax.jit(up_matmul), x)
            l = time_fn(jax.jit(up_lerp), x)
            # numeric check (f32 reference)
            ref = up_matmul(x.astype(jnp.float32))
            got = up_lerp(x.astype(jnp.float32))
            err = float(jnp.abs(ref - got).max())
            key = f"{name}_{dt.__name__}"
            results[key] = {
                "matmul_us_per_scan": round(m, 1),
                "lerp_us_per_scan": round(l, 1),
                "speedup": round(m / l, 2),
                "max_abs_diff_f32": err,
            }
            print(key, json.dumps(results[key]))
    out = os.path.join(os.path.dirname(__file__), "..", "runs", "upsample_probe.json")
    with open(out, "w") as fp:
        json.dump({"batch": B, "iters": ITERS, "results": results}, fp, indent=2)
    print("wrote", os.path.abspath(out))


if __name__ == "__main__":
    main()
