"""Mosaic feature/cost probes for the fused Pallas CNN design (r2).

Questions (docs/PERF.md "Known headroom"; design notes in
ops/cnn_pallas.py once landed):
  P1  per-grid-step dispatch cost for FAT steps: grid=(B,) vs (B,8)
      doing identical total work -- is the windowed kernel's ~20 us/step
      a fixed cost or does it overlap/shrink for real workloads?
  P2  sub-128 lane-offset concat shifts on WIDE arrays ([16, 14592]):
      does Mosaic lower x[:, 1:] / x[:, 721:] concats off the 128-lane
      grid, and at what cost?
  P3  in-kernel 2-D<->2-D reshape (C, L) <-> (C*L/128, 128).
  P4  realistic conv2 strip core: dynamic 128-aligned lane slice of a
      VMEM-resident input + 9-shift im2col concat + [32,145]@[145,14592]
      bf16 dot, 10 strips per scan in a fori loop.
  P5  manual async_copy of a VMEM scratch strip into an ANY (HBM) output.

Run on the real TPU: python scripts/bench_pallas_cnn_probes.py
Each probe prints one JSON line; failures print the exception type so a
single run answers every question.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir", "/root/repo/.jax_cache"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 128
ITERS = 30


def fence(x):
    return float(jnp.sum(x[..., 0, 0] if x.ndim > 2 else x[0]))


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    fence(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    fence(outs[-1])
    dt = time.perf_counter() - t0
    return dt / ITERS, outs[0]


def report(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def guard(name):
    def deco(f):
        def wrapped():
            try:
                f()
            except Exception as e:
                report(name, error=type(e).__name__, msg=str(e)[:300])
                traceback.print_exc(limit=3)
        return wrapped
    return deco


# ---------------------------------------------------------------- P1
ROWS = 1024


def _p1_work(x):
    # ~24 VPU passes over the block: enough work that a fat step is
    # compute-dominated, so fixed per-step cost shows as the delta.
    for _ in range(8):
        x = x * 1.0001 + 0.5
        x = jnp.maximum(x, x * 0.999)
    return x


def _p1_kernel(x_ref, o_ref):
    o_ref[...] = _p1_work(x_ref[...])


@guard("p1_grid_overhead")
def p1():
    x = jnp.ones((B, ROWS, 128), jnp.float32)
    res = {}
    for splits in (1, 8):
        rb = ROWS // splits
        fn = jax.jit(
            lambda x, rb=rb, splits=splits: pl.pallas_call(
                _p1_kernel,
                out_shape=jax.ShapeDtypeStruct((B, ROWS, 128), jnp.float32),
                grid=(B, splits),
                in_specs=[pl.BlockSpec((1, rb, 128), lambda b, s: (b, s, 0))],
                out_specs=pl.BlockSpec((1, rb, 128), lambda b, s: (b, s, 0)),
            )(x)
        )
        dt, out = timeit(fn, x)
        res[f"us_per_scan_grid{B}x{splits}"] = round(dt / B * 1e6, 2)
    steps_delta = (res[f"us_per_scan_grid{B}x8"] - res[f"us_per_scan_grid{B}x1"]) / 7
    report("p1_grid_overhead", **res, us_per_extra_step=round(steps_delta, 3))


# ---------------------------------------------------------------- P2
WIDE = 14592  # 114 * 128


def _p2_kernel(x_ref, o_ref):
    x = x_ref[0]
    acc = x
    for _ in range(10):
        s1 = jnp.concatenate([acc[:, 1:], acc[:, :1]], axis=1)
        s721 = jnp.concatenate([acc[:, 721:], acc[:, :721]], axis=1)
        acc = acc * 0.5 + s1 * 0.25 + s721 * 0.25
    o_ref[0] = acc


@guard("p2_wide_shift")
def p2():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, WIDE), jnp.float32)
    fn = jax.jit(
        lambda x: pl.pallas_call(
            _p2_kernel,
            out_shape=jax.ShapeDtypeStruct((1, 16, WIDE), jnp.float32),
            grid=(1,),
            in_specs=[pl.BlockSpec((1, 16, WIDE), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, 16, WIDE), lambda b: (b, 0, 0)),
        )(x)
    )
    def ref(x):
        acc = x[0]
        for _ in range(10):
            s1 = jnp.concatenate([acc[:, 1:], acc[:, :1]], axis=1)
            s721 = jnp.concatenate([acc[:, 721:], acc[:, :721]], axis=1)
            acc = acc * 0.5 + s1 * 0.25 + s721 * 0.25
        return acc[None]
    dt, out = timeit(fn, x)
    err = float(jnp.max(jnp.abs(out - ref(x))))
    report("p2_wide_shift", us=round(dt * 1e6, 1), max_err=err)


# ---------------------------------------------------------------- P3
def _p3_kernel(x_ref, o_ref):
    x = x_ref[0]                       # [16, WIDE]
    r = x.reshape(16 * WIDE // 128, 128)
    r = r + 1.0
    o_ref[0] = r.reshape(16, WIDE)


@guard("p3_reshape")
def p3():
    x = jnp.asarray(np.random.RandomState(1).rand(1, 16, WIDE), jnp.float32)
    fn = jax.jit(
        lambda x: pl.pallas_call(
            _p3_kernel,
            out_shape=jax.ShapeDtypeStruct((1, 16, WIDE), jnp.float32),
            grid=(1,),
            in_specs=[pl.BlockSpec((1, 16, WIDE), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, 16, WIDE), lambda b: (b, 0, 0)),
        )(x)
    )
    dt, out = timeit(fn, x)
    err = float(jnp.max(jnp.abs(out - (x + 1.0))))
    report("p3_reshape", us=round(dt * 1e6, 1), max_err=err)


# ---------------------------------------------------------------- P4
LPAD = 118272          # 115200 + 2*1536
LS = 11520             # strip length (16 rows of 720)
SLACK = 1536
XS = LS + 2 * SLACK    # 14592


def _p4_kernel(x_ref, w_ref, o_ref):
    xw = x_ref[0]                        # [16, LPAD] bf16 whole scan
    w = w_ref[...]                       # [32, 145] bf16

    def strip(s, carry):
        off = pl.multiple_of(s * LS, 128)  # TRUE: LS = 90*128
        xs = jax.lax.dynamic_slice(xw, (0, off), (16, XS))
        parts = []
        for dh in (-1, 0, 1):
            for dw in (-1, 0, 1):
                sh = dh * 720 + dw
                if sh == 0:
                    parts.append(xs)
                else:
                    parts.append(
                        jnp.concatenate([xs[:, sh:], xs[:, :sh]], axis=1)
                    )
        ones = jnp.ones((1, XS), jnp.bfloat16)
        X = jnp.concatenate(parts + [ones], axis=0)   # [145, XS]
        y = jax.lax.dot_general(
            w, X, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [32, XS]
        y = jnp.maximum(y, 0.0)
        return carry + jnp.sum(y[:, SLACK:SLACK + 8], axis=1, keepdims=True)

    acc = jax.lax.fori_loop(0, 10, strip, jnp.zeros((32, 1), jnp.float32))
    o_ref[0] = jnp.broadcast_to(acc, (32, 128))


@guard("p4_conv_strip_core")
def p4():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(B, 16, LPAD), jnp.bfloat16)
    w = jnp.asarray(rs.rand(32, 145) * 0.1, jnp.bfloat16)
    fn = jax.jit(
        lambda x, w: pl.pallas_call(
            _p4_kernel,
            out_shape=jax.ShapeDtypeStruct((B, 32, 128), jnp.float32),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 16, LPAD), lambda b: (b, 0, 0)),
                pl.BlockSpec((32, 145), lambda b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 32, 128), lambda b: (b, 0, 0)),
        )(x, w)
    )
    dt, out = timeit(fn, x, w)
    report(
        "p4_conv_strip_core",
        us_per_scan=round(dt / B * 1e6, 2),
        finite=bool(jnp.isfinite(out).all()),
    )


# ---------------------------------------------------------------- P5
@guard("p5_manual_dma_out")
def p5():
    def kernel(x_ref, o_hbm, scratch, sem):
        def strip(s, _):
            scratch[...] = x_ref[0, :, :] * (s + 1).astype(jnp.float32)
            cp = pltpu.make_async_copy(
                scratch, o_hbm.at[0, :, pl.ds(s * 128, 128)], sem
            )
            cp.start()
            cp.wait()
            return 0
        jax.lax.fori_loop(0, 4, strip, 0)

    x = jnp.asarray(np.random.RandomState(3).rand(1, 8, 128), jnp.float32)
    fn = jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 512), jnp.float32),
            grid=(1,),
            in_specs=[pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(x)
    )
    out = np.asarray(fn(x))
    want = np.concatenate([np.asarray(x[0]) * (s + 1) for s in range(4)], axis=1)
    report("p5_manual_dma_out", max_err=float(np.abs(out[0] - want).max()))


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    p1()
    p2()
    p3()
    p4()
    p5()
