"""Microbenchmark: lax.sort cost vs shape on the attached TPU.

Round-2 descriptor work needs the scaling law of XLA's TPU sort:
- is it depth-dominated (cost ~ log^2 n, batch-size free)?
- do batched small sorts win per element?
- what do top_k / gather cost at descriptor scale?

Timing per docs/PERF.md: fetch a scalar from every output (the axon
backend's block_until_ready can return early), warmup once, then
average over ITERS timed runs.
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

ITERS = 5
B = 64
N = 131072
CELLS = 160 * 720


def timed(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)  # compile + warmup
    _sink(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn_j(*args)
        _sink(out)
    dt = (time.perf_counter() - t0) / ITERS
    per_scan_us = dt / B * 1e6
    print(json.dumps({"name": name, "ms": round(dt * 1e3, 3),
                      "us_per_scan": round(per_scan_us, 1)}))
    sys.stdout.flush()
    return dt


def _sink(out):
    leaves = jax.tree.leaves(out)
    for leaf in leaves:
        # fetch one scalar to force completion
        float(jnp.sum(leaf[(0,) * (leaf.ndim - 1)][..., :1].astype(jnp.float32)))


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    cell = jnp.asarray(
        rng.integers(0, CELLS, size=(B, N)), jnp.int32
    )
    z = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    cell246 = jnp.concatenate(
        [cell, jnp.broadcast_to(jnp.arange(CELLS, dtype=jnp.int32), (B, CELLS))],
        axis=1,
    )
    z246 = jnp.concatenate(
        [z, jnp.full((B, CELLS), -np.inf, jnp.float32)], axis=1
    )

    # 1. current shapes
    timed("sort2k_246k", lambda c, v: jax.lax.sort((c, v), num_keys=2),
          cell246, z246)
    timed("sort2k_131k", lambda c, v: jax.lax.sort((c, v), num_keys=2),
          cell, z)
    timed("sort1k_131k_f32", lambda v: jax.lax.sort((v,), num_keys=1)[0], z)

    # 1b. one key + one payload operand (is the cost keys or operands?)
    timed("sort_1key_i32_f32payload_246k",
          lambda c, v: jax.lax.sort((c, v), num_keys=1), cell246, z246)

    # 2. batched small sorts (same total data, smaller segments)
    for seg in (32768, 8192, 2048, 1024):
        c2 = cell.reshape(B * (N // seg), seg)
        z2 = z.reshape(B * (N // seg), seg)
        timed(f"sort2k_seg{seg}",
              lambda c, v: jax.lax.sort((c, v), num_keys=2), c2, z2)

    # 3. fused single sort (VERDICT control experiment): batch id folded
    #    into the key so one [B*N] sort replaces B sorts.
    key_f = (cell.astype(jnp.int64)
             + jnp.arange(B, dtype=jnp.int64)[:, None] * (CELLS + 2)).reshape(-1)
    zf = z.reshape(-1)
    timed("sort2k_fused_8p4M_i64key",
          lambda c, v: jax.lax.sort((c, v), num_keys=2), key_f, zf)

    # 4. top_k at compaction scale
    timed("topk_115200_of_246k", lambda v: jax.lax.top_k(v, CELLS), z246)

    # 5. gather at compaction scale (sorted indices)
    idx = jnp.asarray(
        np.sort(rng.integers(0, N + CELLS, size=(B, CELLS)), axis=1), jnp.int32
    )
    timed("gather_115200_sorted",
          lambda v, i: jnp.take_along_axis(v, i, axis=1), z246, idx)

    # 6. cumsum at descriptor scale (for the Pallas-compaction alternative
    #    computed at XLA level)
    timed("cumsum_246k", lambda v: jnp.cumsum(v, axis=1), z246)

    # 7. full descriptors: two-sort vs sort+route
    from distropointclouds_tpu.core.config import ScanContextConfig
    from distropointclouds_tpu.ops.scan_context import (
        scan_context_sort_route,
        scan_context_sorted,
    )

    cfg = ScanContextConfig.golden_v2()
    xyz = jnp.asarray(rng.uniform(-25, 25, size=(B, N, 3)).astype(np.float32))
    valid = jnp.ones((B, N), bool)
    timed("descriptor_sorted_full",
          jax.vmap(lambda p, v: scan_context_sorted(p, v, cfg)), xyz, valid)
    timed("descriptor_sort_route",
          jax.vmap(lambda p, v: scan_context_sort_route(p, v, cfg)), xyz, valid)
    # routing compaction alone (bandwidth probe)
    sc_, sz_ = jax.jit(
        lambda c, v: jax.lax.sort((c, v), num_keys=2, dimension=-1)
    )(cell246, z246)
    from distropointclouds_tpu.ops.scan_context import compact_run_ends

    timed("compact_route_alone",
          lambda c, v: compact_run_ends(c, v, CELLS), sc_, sz_)


if __name__ == "__main__":
    main()
