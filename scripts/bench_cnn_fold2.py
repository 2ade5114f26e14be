"""Isolate why the bench_cnn_layers.py skeleton (152 us/scan) beats the
real/folded TinyCNN forward (270 us/scan). Structural deltas:
  bias: folded has per-layer bias adds, skeleton had none
  wmode: weights as traced args vs closure constants
  out: full [B,160,720,1] logits vs scalar sum
Run the 2x2x2-ish matrix to find the 120 us/scan.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from distropointclouds_tpu.io import fixtures
from distropointclouds_tpu.models.layers import normalize_minmax
from distropointclouds_tpu.models import torch_import
from scripts.bench_cnn_fold import fold

B = 96
ITERS = 20


def forward(w, x, use_bias):
    def conv(x, kb, pad=1):
        k, b = kb
        y = lax.conv_general_dilated(
            x, k, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b if use_bias else y

    def pool(x):
        return lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def t2x2(x, kb):
        k, b = kb
        Bs, H, W, C = x.shape
        y = jnp.einsum("bhwc,uvco->bhuwvo", x, k)
        y = y.reshape(Bs, H * 2, W * 2, k.shape[-1])
        return y + b if use_bias else y

    x = jnp.maximum(conv(x, w["enc1"]), 0)
    x = jnp.maximum(conv(x, w["enc2"]), 0)
    x = pool(x)
    x = jnp.maximum(conv(x, w["enc3"]), 0)
    x = pool(x)
    x = jnp.maximum(conv(x, w["enc4"]), 0)
    x = pool(x)
    x = jnp.maximum(t2x2(x, w["dec1"]), 0)
    x = jnp.maximum(t2x2(x, w["dec2"]), 0)
    x = jnp.maximum(t2x2(x, w["dec3"]), 0)
    return conv(x, w["head"], pad=0)


def timed(name, fn_j, args, scalar_out):
    def fence(o):
        return float(o if scalar_out else jnp.sum(o[:, 0, 0, 0]))

    fence(fn_j(*args))
    fence(fn_j(*args))
    t0 = time.perf_counter()
    outs = [fn_j(*args) for _ in range(ITERS)]
    fence(outs[-1])
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"name": name, "ms_batch": round(dt * 1e3, 2),
                      "us_per_scan": round(dt / B * 1e6, 1)}))
    sys.stdout.flush()


def main():
    print("devices:", jax.devices())
    ids = fixtures.GOLDEN_IDS
    scs = np.stack([fixtures.golden_descriptor(s).astype(np.float32) for s in ids])
    xs = np.asarray(normalize_minmax(jnp.asarray(scs)))
    batch = jax.device_put(
        jnp.asarray(np.stack([xs[i % len(ids)] for i in range(B)]))[..., None])
    w = fold(torch_import.load_tiny_cnn())

    # args + bias + full out (== fold probe, 270)
    timed("args_bias_full", jax.jit(lambda w, x: forward(w, x, True)),
          (w, batch), False)
    # args + nobias + full out
    timed("args_nobias_full", jax.jit(lambda w, x: forward(w, x, False)),
          (w, batch), False)
    # const + bias + full out
    timed("const_bias_full", jax.jit(lambda x: forward(w, x, True)),
          (batch,), False)
    # const + nobias + scalar out (== layers probe skeleton, 152)
    timed("const_nobias_scalar",
          jax.jit(lambda x: jnp.sum(forward(w, x, False))), (batch,), True)
    # args + bias + scalar out
    timed("args_bias_scalar",
          jax.jit(lambda w, x: jnp.sum(forward(w, x, True))), (w, batch), True)


if __name__ == "__main__":
    main()
