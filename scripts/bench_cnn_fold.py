"""Test the BN-folding hypothesis on the real shipped TinyCNN.

bench_cnn_layers.py: a BN-less conv skeleton runs 14.6 ms/batch96 while
the real model (with inference BatchNorm) runs 26.2 — ~120 us/scan in
elementwise BN stages XLA evidently does not fuse into the convs on
this backend. Fold BN affine+stats into the conv kernels/biases
(exact algebra, f32 rounding only) and measure.
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
from distropointclouds_tpu.models.tiny_cnn import TinyCNN
from distropointclouds_tpu.models.layers import normalize_minmax
from distropointclouds_tpu.models import torch_import

B = 96
ITERS = 20
EPS = 1e-5


def fold(variables):
    """BN-folded flat weights: {name: (kernel, bias)} for enc1..4,
    dec1..3, head. relu(BN(conv(x, W) + b)) == relu(conv(x, W*s) + b')
    with s = scale/sqrt(var+eps), b' = (b - mean)*s + beta."""
    p = jax.tree.map(np.asarray, variables["params"])
    st = jax.tree.map(np.asarray, variables["batch_stats"])
    out = {}
    for name in ("enc1", "enc2", "enc3", "enc4"):
        W = p[name]["conv"]["kernel"]
        b = p[name]["conv"].get("bias", np.zeros(W.shape[-1], np.float32))
        bn = p[name]["bn"]
        s = bn["scale"] / np.sqrt(st[name]["bn"]["var"] + EPS)
        out[name] = (W * s, (b - st[name]["bn"]["mean"]) * s + bn["bias"])
    for cname, bname in (("dec1", "dbn1"), ("dec2", "dbn2"), ("dec3", "dbn3")):
        W = p[cname]["kernel"]  # [2, 2, I, O]
        b = p[cname].get("bias", np.zeros(W.shape[-1], np.float32))
        s = p[bname]["scale"] / np.sqrt(st[bname]["var"] + EPS)
        out[cname] = (W * s, (b - st[bname]["mean"]) * s + p[bname]["bias"])
    out["head"] = (p["head"]["kernel"], p["head"]["bias"])
    return jax.tree.map(jnp.asarray, out)


def folded_forward(w, x):
    def conv(x, kb):
        k, b = kb
        return lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    def pool(x):
        return lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def t2x2(x, kb):
        k, b = kb
        Bs, H, W, C = x.shape
        y = jnp.einsum("bhwc,uvco->bhuwvo", x, k)
        return y.reshape(Bs, H * 2, W * 2, k.shape[-1]) + b

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
    k, b = w["head"]
    return lax.conv_general_dilated(
        x, k, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def timed(name, fn_j, *args):
    def fence(o):
        return float(jnp.sum(o[:, 0, 0, 0]))

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
    batch = jnp.asarray(np.stack([xs[i % len(ids)] for i in range(B)]))[..., None]
    batch = jax.device_put(batch)

    variables = torch_import.load_tiny_cnn()
    model = TinyCNN()
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    w = fold(variables)
    ffwd = jax.jit(folded_forward)

    a = np.asarray(fwd(variables, batch))[:4, ..., 0]
    b = np.asarray(ffwd(w, batch))[:4, ..., 0]
    print("max |folded - unfolded| on-device:", float(np.abs(a - b).max()))
    sys.stdout.flush()

    timed("tinycnn_bn", fwd, variables, batch)
    timed("tinycnn_folded", ffwd, w, batch)


if __name__ == "__main__":
    main()
