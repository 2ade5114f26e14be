"""Localize TinyCNN forward cost per layer + try NCHW layout.

bench_cnn_precision.py showed the full NHWC forward at B=96 costs
273 us/scan at DEFAULT (bf16-pass) and 428 at HIGHEST — but the model
is only 3.6 GFLOP/scan (~13 TF/s achieved), far from both the MXU peak
and the ~134 us/scan HBM floor for its ~110 MB/scan activation traffic.
Suspect: XLA pads the small NHWC channel dim (16/32) to 128 lanes in
inter-layer layouts, multiplying the traffic. This probe times each
layer separately and the whole model under NHWC vs NCHW.
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

B = 96
ITERS = 20
rng = np.random.default_rng(0)


def timed(name, fn, *args):
    # Reduce inside jit so queued iteration outputs are scalars, not
    # full activation maps (keeping ITERS full maps alive OOMs HBM).
    def reduced(*a):
        # Full-sum the output: a [:1] slice could let XLA narrow the
        # conv; a full reduction cannot be eliminated (costs one extra
        # read of the output, same small bias for every variant).
        leaf = jax.tree.leaves(fn(*a))[0]
        return jnp.sum(leaf.astype(jnp.float32))

    fn_j = jax.jit(reduced)

    def fence(o):
        return float(o)

    fence(fn_j(*args))
    fence(fn_j(*args))
    t0 = time.perf_counter()
    outs = [fn_j(*args) for _ in range(ITERS)]
    fence(outs[-1])
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"name": name, "ms_batch": round(dt * 1e3, 3),
                      "us_per_scan": round(dt / B * 1e6, 1)}))
    sys.stdout.flush()


def conv_nhwc(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_nchw(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "HWIO", "NCHW"))


def pool_nhwc(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def pool_nchw(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def main():
    print("devices:", jax.devices())
    H, W = 160, 720
    # weights
    ws = {
        "enc1": rng.standard_normal((3, 3, 1, 16), np.float32) * 0.1,
        "enc2": rng.standard_normal((3, 3, 16, 32), np.float32) * 0.1,
        "enc3": rng.standard_normal((3, 3, 32, 64), np.float32) * 0.1,
        "enc4": rng.standard_normal((3, 3, 64, 128), np.float32) * 0.1,
        "dec1": rng.standard_normal((2, 2, 128, 64), np.float32) * 0.1,
        "dec2": rng.standard_normal((2, 2, 64, 32), np.float32) * 0.1,
        "dec3": rng.standard_normal((2, 2, 32, 16), np.float32) * 0.1,
        "head": rng.standard_normal((1, 1, 16, 1), np.float32) * 0.1,
    }
    ws = {k: jnp.asarray(v) for k, v in ws.items()}

    # --- per-layer NHWC costs
    acts = {
        "enc1": (B, H, W, 1), "enc2": (B, H, W, 16),
        "enc3": (B, H // 2, W // 2, 32), "enc4": (B, H // 4, W // 4, 64),
        "head": (B, H, W, 16),
    }
    for name, shape in acts.items():
        x = jnp.asarray(rng.standard_normal(shape, np.float32))
        timed(f"nhwc_{name}", lambda x, w=ws[name]: jnp.maximum(conv_nhwc(x, w), 0), x)

    # transposed-conv einsum stages (dec1 at 20x90x128 etc.)
    for name, shape in (("dec1", (B, 20, 90, 128)), ("dec2", (B, 40, 180, 64)),
                        ("dec3", (B, 80, 360, 32))):
        x = jnp.asarray(rng.standard_normal(shape, np.float32))

        def t2x2(x, w=ws[name]):
            Bs, Hs, Ws, C = x.shape
            y = jnp.einsum("bhwc,uvco->bhuwvo", x, w)
            return y.reshape(Bs, Hs * 2, Ws * 2, w.shape[-1])

        timed(f"nhwc_{name}", t2x2, x)

    # pools
    x = jnp.asarray(rng.standard_normal((B, H, W, 32), np.float32))
    timed("nhwc_pool1", pool_nhwc, x)

    # --- full forward NHWC vs NCHW (conv+relu+pool skeleton, no BN —
    # BN folds into epilogues; this isolates layout effects)
    def full_nhwc(x):
        x = jnp.maximum(conv_nhwc(x, ws["enc1"]), 0)
        x = jnp.maximum(conv_nhwc(x, ws["enc2"]), 0)
        x = pool_nhwc(x)
        x = jnp.maximum(conv_nhwc(x, ws["enc3"]), 0)
        x = pool_nhwc(x)
        x = jnp.maximum(conv_nhwc(x, ws["enc4"]), 0)
        x = pool_nhwc(x)
        for name in ("dec1", "dec2", "dec3"):
            w = ws[name]
            Bs, Hs, Ws, C = x.shape
            y = jnp.einsum("bhwc,uvco->bhuwvo", x, w)
            x = jnp.maximum(y.reshape(Bs, Hs * 2, Ws * 2, w.shape[-1]), 0)
        return conv_nhwc(x, ws["head"])

    def full_nchw(x):
        # x: [B, C, H, W]; weights stay HWIO
        x = jnp.maximum(conv_nchw(x, ws["enc1"]), 0)
        x = jnp.maximum(conv_nchw(x, ws["enc2"]), 0)
        x = pool_nchw(x)
        x = jnp.maximum(conv_nchw(x, ws["enc3"]), 0)
        x = pool_nchw(x)
        x = jnp.maximum(conv_nchw(x, ws["enc4"]), 0)
        x = pool_nchw(x)
        for name in ("dec1", "dec2", "dec3"):
            w = ws[name]
            Bs, C, Hs, Ws = x.shape
            y = jnp.einsum("bchw,uvco->bohuwv", x, w)
            x = jnp.maximum(y.reshape(Bs, w.shape[-1], Hs * 2, Ws * 2), 0)
        return conv_nchw(x, ws["head"])

    x4 = jnp.asarray(rng.standard_normal((B, H, W, 1), np.float32))
    a = timed("full_nhwc", full_nhwc, x4)
    x4c = jnp.transpose(x4, (0, 3, 1, 2))
    b = timed("full_nchw", full_nchw, x4c)

    # bf16 activations fast mode (opt-in): params f32, activations bf16
    def full_nhwc_bf16(x):
        ws16 = {k: v.astype(jnp.bfloat16) for k, v in ws.items()}
        x = x.astype(jnp.bfloat16)
        x = jnp.maximum(conv_nhwc(x, ws16["enc1"]), 0)
        x = jnp.maximum(conv_nhwc(x, ws16["enc2"]), 0)
        x = pool_nhwc(x)
        x = jnp.maximum(conv_nhwc(x, ws16["enc3"]), 0)
        x = pool_nhwc(x)
        x = jnp.maximum(conv_nhwc(x, ws16["enc4"]), 0)
        x = pool_nhwc(x)
        for name in ("dec1", "dec2", "dec3"):
            w = ws16[name]
            Bs, Hs, Ws, C = x.shape
            y = jnp.einsum("bhwc,uvco->bhuwvo", x, w)
            x = jnp.maximum(y.reshape(Bs, Hs * 2, Ws * 2, w.shape[-1]), 0)
        return conv_nhwc(x, ws16["head"]).astype(jnp.float32)

    timed("full_nhwc_bf16acts", full_nhwc_bf16, x4)


if __name__ == "__main__":
    main()
