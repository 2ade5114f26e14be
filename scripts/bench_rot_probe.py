"""Differential probe: what does one lane rotation cost in Mosaic?

Variants, each 200 chained ops on a [32, 14592] bf16 array, grid=(64,):
  add        x = x * 1.0009 + c            (VPU baseline)
  rot1       x = rot(x, 1) * 1.0009       (sub-128 lane rotation)
  rot128     x = rot(x, 128) * 1.0009     (tile-aligned lane concat)
  rot721     x = rot(x, 721) * 1.0009     (mixed)
  rot_row    x = roll rows (sublane concat) * 1.0009
  mask       x = x * m                    (precomputed mask multiply)

us_per_op = (t_variant - t_add) / 200 / 64  -> the marginal cost of the
op vs a plain VPU pass. Run on TPU: python scripts/bench_rot_probe.py
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

B = 64
OPS = 200
ITERS = 10
ROWS, N = 32, 14592


def _rot(x, sh):
    return jnp.concatenate([x[:, sh:], x[:, :sh]], axis=1)


def _rotrow(x, sh):
    return jnp.concatenate([x[sh:], x[:sh]], axis=0)


def make_kernel(variant):
    def kernel(x_ref, o_ref):
        x = x_ref[0]
        m = None
        if variant == "mask":
            i = jax.lax.broadcasted_iota(jnp.int32, (ROWS, N), 1)
            m = ((i % 720) != 0).astype(x.dtype)
        for k in range(OPS):
            if variant == "add":
                x = x * jnp.bfloat16(1.0009) + jnp.bfloat16(1e-6)
            elif variant == "rot1":
                x = _rot(x, 1) * jnp.bfloat16(1.0009)
            elif variant == "rot128":
                x = _rot(x, 128) * jnp.bfloat16(1.0009)
            elif variant == "rot721":
                x = _rot(x, 721) * jnp.bfloat16(1.0009)
            elif variant == "rot_row":
                x = _rotrow(x, 8) * jnp.bfloat16(1.0009)
            elif variant == "mask":
                x = x * m + jnp.bfloat16(1e-6)
        o_ref[0] = x
    return kernel


def main():
    print("device:", jax.devices()[0], flush=True)
    x = jnp.asarray(
        np.random.RandomState(0).rand(B, ROWS, N), jnp.bfloat16
    )
    times = {}
    for variant in ("add", "rot1", "rot128", "rot721", "rot_row", "mask"):
        kern = make_kernel(variant)

        def call(x, kern=kern):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((B, ROWS, N), jnp.bfloat16),
                grid=(B,),
                in_specs=[pl.BlockSpec((1, ROWS, N), lambda b: (b, 0, 0))],
                out_specs=pl.BlockSpec((1, ROWS, N), lambda b: (b, 0, 0)),
            )(x)

        fn = jax.jit(call)
        try:
            out = jax.block_until_ready(fn(x))
            float(jnp.sum(out[0, 0, :1]))
            t0 = time.perf_counter()
            outs = [fn(x) for _ in range(ITERS)]
            float(jnp.sum(outs[-1][0, 0, :1]))
            dt = (time.perf_counter() - t0) / ITERS
            times[variant] = dt
            extra = (
                (dt - times["add"]) / OPS / B * 1e6
                if variant != "add" else 0.0
            )
            print(json.dumps({
                "variant": variant,
                "ms_total": round(dt * 1e3, 2),
                "marginal_us_per_op": round(extra, 3),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"variant": variant,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
