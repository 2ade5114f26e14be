"""Per-kernel timing of the fused Pallas CNN (K1..K4 + XLA glue).

Each stage is timed as its own jitted program on prepared inputs at
B=DPC_B (default 128), dispatch-all-then-fence-last (docs/PERF.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from distropointclouds_tpu.models import torch_import
from distropointclouds_tpu.ops import cnn_pallas as cp

B = int(os.environ.get("DPC_B", "128"))
ITERS = int(os.environ.get("DPC_ITERS", "20"))


def bench(name, fn, *args):
    try:
        out = jax.block_until_ready(fn(*args))
        float(jnp.sum(out.ravel()[0]))
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(ITERS)]
        float(jnp.sum(outs[-1].ravel()[0]))
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({"stage": name, "us_per_scan": round(dt / B * 1e6, 1)}),
              flush=True)
        return out
    except Exception as e:
        print(json.dumps({"stage": name, "error": type(e).__name__,
                          "msg": str(e)[:200]}), flush=True)
        raise


def main():
    print("devices:", jax.devices(), flush=True)
    rs = np.random.RandomState(0)
    variables = torch_import.load_tiny_cnn()
    wts = {k: v.astype(jnp.bfloat16)
           for k, v in jax.jit(cp.fold_weights)(variables).items()}
    wts = jax.device_put(wts)

    xf = jax.device_put(jnp.asarray(
        rs.rand(B, 1, cp.LPAD1) - 0.5, jnp.bfloat16))
    p2 = jax.device_put(jnp.asarray(
        rs.rand(B, 32, cp.LPAD2), jnp.bfloat16))
    p3 = jax.device_put(jnp.asarray(
        rs.rand(B, 64, cp.LPAD3), jnp.bfloat16))
    p4 = jax.device_put(jnp.asarray(
        rs.rand(B, 128, cp.LPAD4), jnp.bfloat16))

    k1 = jax.jit(lambda x, w1, w2: pl.pallas_call(
        cp._k1_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 32, cp.L), jnp.bfloat16),
        grid=(B, cp.NS1),
        in_specs=[
            pl.BlockSpec((1, 1, cp.LPAD1), lambda b, s: (b, 0, 0)),
            cp._wspec((16, 10)), cp._wspec((32, 145)),
        ],
        out_specs=pl.BlockSpec((1, 32, cp.LS1), lambda b, s: (b, 0, s)),
    )(x, w1, w2)[:, :, :128])
    bench("K1 conv1+conv2 (160x720)", k1, xf, wts["w1"], wts["w2"])
    a2 = jax.device_put(jnp.asarray(rs.rand(B, 32, cp.L), jnp.bfloat16))

    k2 = jax.jit(lambda p, w: pl.pallas_call(
        cp._k2_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 64, cp.L2), jnp.bfloat16),
        grid=(B, cp.NS2),
        in_specs=[
            pl.BlockSpec((1, 32, cp.LPAD2), lambda b, s: (b, 0, 0)),
            cp._wspec((64, 289)),
        ],
        out_specs=pl.BlockSpec((1, 64, cp.LS2), lambda b, s: (b, 0, s)),
    )(p, w)[:, :, :128])
    bench("K2 conv3 (80x360)", k2, p2, wts["w3"])

    k3 = jax.jit(lambda p, w0, wa, wb: pl.pallas_call(
        cp._k3_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 128, cp.LPAD3), jnp.bfloat16),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 64, cp.LPAD3), lambda b: (b, 0, 0)),
            cp._wspec((128, 193)), cp._wspec((128, 192)), cp._wspec((128, 192)),
        ],
        out_specs=pl.BlockSpec((1, 128, cp.LPAD3), lambda b: (b, 0, 0)),
    )(p, w0, wa, wb)[:, :, :128])
    bench("K3 conv4 (40x180)", k3, p3, wts["w4c0"], wts["w4c1"], wts["w4c2"])

    k4 = jax.jit(lambda p, a, b_, c, d: pl.pallas_call(
        cp._k4_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 4, 16 * cp.LPAD4), jnp.bfloat16),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 128, cp.LPAD4), lambda b: (b, 0, 0)),
            cp._wspec((256, 129)), cp._wspec((128, 65)),
            cp._wspec((64, 33)), cp._wspec((4, 65)),
        ],
        out_specs=pl.BlockSpec((1, 4, 16 * cp.LPAD4), lambda b: (b, 0, 0)),
    )(p, a, b_, c, d)[:, :, :128])
    bench("K4 decoder (20x90)", k4, p4, wts["wd1"], wts["wd2"], wts["wd3"],
          wts["wh4"])

    def glue(a2):
        p2 = cp._pool(a2, cp.H, cp.W)
        p2 = jnp.pad(p2, ((0, 0), (0, 0), (cp.SLACK2, cp.SLACK2)))
        return p2[:, :, :128]
    bench("glue pool1+pad", jax.jit(glue), a2)

    def interleave(lg):
        lg = lg[:, :, :cp.L4].reshape(B, 2, 2, 2, 2, 2, 2, cp.H4, cp.W4)
        lg = jnp.transpose(lg, (0, 7, 1, 3, 5, 8, 2, 4, 6))
        return lg.reshape(B, cp.H, cp.W)[:, :, :128]
    lgin = jax.device_put(jnp.asarray(rs.rand(B, 64, cp.LPAD4), jnp.float32))
    bench("glue depth-to-space", jax.jit(interleave), lgin)


if __name__ == "__main__":
    main()
