"""Round 2 of the sort-shape microbenchmark, with pipelined timing
(dispatch all iters, then fence — matching bench.py) so tunnel RTT is
amortized instead of added per iteration.

Adds the single-operand probes motivated by round 1's discovery that
lax.sort cost scales with OPERAND COUNT, not key count:
- f32/i32/i64 one-operand sorts at descriptor scale,
- the packed-key descriptor idea: key = cell << 32 | ordered(z) as one
  i64 operand; z decodes from the sorted key, so no payload operand.
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
jax.config.update("jax_enable_x64", True)  # for the i64 packed-key probes

ITERS = 8
B = 64
N = 131072
CELLS = 160 * 720


def timed(name, fn, *args):
    fn_j = jax.jit(fn)

    def sink(out):
        for leaf in jax.tree.leaves(out):
            float(
                jnp.sum(leaf[(0,) * (leaf.ndim - 1)][..., :1].astype(jnp.float32))
            )

    sink(fn_j(*args))  # compile + warmup
    sink(fn_j(*args))
    t0 = time.perf_counter()
    outs = [fn_j(*args) for _ in range(ITERS)]
    for o in outs:
        sink(o)
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"name": name, "ms": round(dt * 1e3, 3),
                      "us_per_scan": round(dt / B * 1e6, 1)}))
    sys.stdout.flush()


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    cell = jnp.asarray(rng.integers(0, CELLS, size=(B, N)), jnp.int32)
    z = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    cell246 = jnp.concatenate(
        [cell, jnp.broadcast_to(jnp.arange(CELLS, dtype=jnp.int32), (B, CELLS))],
        axis=1,
    )
    z246 = jnp.concatenate(
        [z, jnp.full((B, CELLS), -np.inf, jnp.float32)], axis=1
    )

    timed("p.sort2k_246k", lambda c, v: jax.lax.sort((c, v), num_keys=2),
          cell246, z246)
    timed("p.sort1op_f32_246k", lambda v: jax.lax.sort((v,), num_keys=1)[0],
          z246)
    timed("p.sort1op_i32_246k", lambda c: jax.lax.sort((c,), num_keys=1)[0],
          cell246)

    def pack(c, v):
        # order-preserving f32 -> u32 (flip trick), cell in high bits
        bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
        ordered = jnp.where(
            bits >> 31 == 1, ~bits, bits | jnp.uint32(0x80000000)
        )
        return (c.astype(jnp.int64) << 32) | ordered.astype(jnp.int64)

    key64 = jax.jit(pack)(cell246, z246)
    timed("p.sort1op_i64_246k", lambda k: jax.lax.sort((k,), num_keys=1)[0],
          key64)

    def unpack_z(k):
        ordered = (k & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
        bits = jnp.where(
            ordered >> 31 == 1, ordered & jnp.uint32(0x7FFFFFFF), ~ordered
        )
        return jax.lax.bitcast_convert_type(bits, jnp.float32)

    def desc_packed(c, v):
        k = pack(c, v)
        sk = jax.lax.sort((k,), num_keys=1)[0]
        sc = (sk >> 32).astype(jnp.int32)
        sv = unpack_z(sk)
        from distropointclouds_tpu.ops.scan_context import compact_run_ends

        return compact_run_ends(sc, sv, CELLS)

    timed("p.desc_packed_sort_route", desc_packed, cell246, z246)

    from distropointclouds_tpu.ops.scan_context import compact_run_ends

    sc_, sz_ = jax.jit(lambda c, v: jax.lax.sort((c, v), num_keys=2))(
        cell246, z246
    )
    timed("p.compact_route_alone",
          lambda c, v: compact_run_ends(c, v, CELLS), sc_, sz_)

    from distropointclouds_tpu.core.config import ScanContextConfig
    from distropointclouds_tpu.ops.scan_context import (
        scan_context_sort_route,
        scan_context_sorted,
    )

    cfg = ScanContextConfig.golden_v2()
    xyz = jnp.asarray(rng.uniform(-25, 25, size=(B, N, 3)).astype(np.float32))
    valid = jnp.ones((B, N), bool)
    timed("p.descriptor_sorted_full",
          jax.vmap(lambda p, v: scan_context_sorted(p, v, cfg)), xyz, valid)
    timed("p.descriptor_sort_route",
          jax.vmap(lambda p, v: scan_context_sort_route(p, v, cfg)), xyz, valid)

    # stage probe: sort #1 + run-end only (no compaction)
    def sort_plus_runend(c, v):
        s_c, s_v = jax.lax.sort((c, v), num_keys=2)
        nxt = jnp.concatenate(
            [s_c[..., 1:], jnp.full_like(s_c[..., :1], -1)], axis=-1
        )
        return jnp.sum(jnp.where(s_c != nxt, s_v, 0.0), axis=-1)

    timed("p.sort_plus_runend", sort_plus_runend, cell246, z246)


if __name__ == "__main__":
    main()
