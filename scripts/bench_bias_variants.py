"""The [C]-broadcast bias add after a conv costs ~118 us/scan across
the TinyCNN (bench_cnn_fold2.py) — it evidently breaks conv epilogue
fusion on this backend while a bare relu does not. Probe single-layer
workarounds on enc2-like shapes ([96,160,720,16] -> 32).
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

B, H, W, CI, CO = 96, 160, 720, 16, 32
ITERS = 20
rng = np.random.default_rng(0)


def timed(name, fn, *args):
    # full-sum inside jit: queued outputs must be scalars (20 live
    # [96,160,720,32] activations OOM HBM), and a full reduction can't
    # be dead-code-eliminated (uniform small bias on every variant).
    fn_j = jax.jit(lambda *a: jnp.sum(fn(*a)))

    def fence(o):
        return float(o)

    fence(fn_j(*args))
    fence(fn_j(*args))
    t0 = time.perf_counter()
    outs = [fn_j(*args) for _ in range(ITERS)]
    fence(outs[-1])
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"name": name, "ms_batch": round(dt * 1e3, 2),
                      "us_per_scan": round(dt / B * 1e6, 1)}))
    sys.stdout.flush()


def conv(x, k, pad=1):
    return lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    print("devices:", jax.devices())
    x = jnp.asarray(rng.standard_normal((B, H, W, CI), np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, CI, CO), np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((CO,), np.float32))
    s = jnp.asarray(rng.standard_normal((CO,), np.float32))

    timed("nobias_relu", lambda x: jnp.maximum(conv(x, k), 0), x)
    timed("bias_relu", lambda x: jnp.maximum(conv(x, k) + b, 0), x)
    timed("scalar_add_relu", lambda x: jnp.maximum(conv(x, k) + 0.37, 0), x)
    bfull = jnp.broadcast_to(b, (1, 1, 1, CO))
    timed("bias4d_relu", lambda x: jnp.maximum(conv(x, k) + bfull, 0), x)
    timed("affine_relu", lambda x: jnp.maximum(conv(x, k) * s + b, 0), x)
    # max(y, -b) + b formulation
    timed("maxneg_relu", lambda x: jnp.maximum(conv(x, k), -b) + b, x)

    # ones-channel folded bias: x17 = concat(x, ones); kernel17 has the
    # bias at the ones-channel center tap.
    k17 = jnp.concatenate(
        [k, jnp.zeros((3, 3, 1, CO), jnp.float32)
             .at[1, 1, 0].set(b)], axis=2)
    ones = jnp.ones((B, H, W, 1), jnp.float32)

    def ones_channel(x):
        x17 = jnp.concatenate([x, ones], axis=3)
        return jnp.maximum(conv(x17, k17), 0)

    timed("oneschan_relu", ones_channel, x)

    # correctness of the ones-channel trick
    a = np.asarray(jnp.maximum(conv(x[:1], k) + b, 0))
    c = np.asarray(ones_channel(x[:1]))
    print("oneschan max delta:", float(np.abs(a - c).max()))


if __name__ == "__main__":
    main()
