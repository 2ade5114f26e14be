"""TPU compile + correctness + timing for the Pallas bitonic descriptor."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from distropointclouds_tpu.core.config import ScanContextConfig
from distropointclouds_tpu.io import fixtures
from distropointclouds_tpu.ops.bitonic import scan_context_bitonic
from distropointclouds_tpu.ops.scan_context import scan_context_sort_route

B = int(os.environ.get("DPC_BITONIC_BATCH", "64"))
ITERS = 8


def main():
    print("devices:", jax.devices())
    cfg = ScanContextConfig.golden_v2()
    N = cfg.max_points

    # correctness batch: the 4 goldens
    xyz = np.zeros((4, N, 3), np.float32)
    valid = np.zeros((4, N), bool)
    for i, sid in enumerate(fixtures.GOLDEN_IDS):
        raw = fixtures.golden_scan(sid)
        xyz[i, : len(raw)] = raw[:, :3]
        valid[i, : len(raw)] = True

    fn = jax.jit(lambda p, v: scan_context_bitonic(p, v, cfg))
    t0 = time.time()
    out = np.asarray(fn(jnp.asarray(xyz), jnp.asarray(valid)))
    print(f"compile+first run: {time.time() - t0:.1f}s")
    ref = np.asarray(
        jax.jit(jax.vmap(lambda p, v: scan_context_sort_route(p, v, cfg)))(
            jnp.asarray(xyz), jnp.asarray(valid)
        )
    )
    for i, sid in enumerate(fixtures.GOLDEN_IDS):
        bad = int((out[i] != fixtures.golden_descriptor(sid)).sum())
        vs_sort = int((out[i] != ref[i]).sum())
        print(f"{sid}: {bad} cells vs golden, {vs_sort} vs on-TPU sort_route")
        assert bad <= 10, (sid, bad)
        assert vs_sort == 0, (sid, vs_sort)

    # timing vs sort_route at batch B
    rng = np.random.default_rng(0)
    bx = jnp.asarray(rng.uniform(-25, 25, size=(B, N, 3)).astype(np.float32))
    bv = jnp.ones((B, N), bool)

    for name, f in (
        ("bitonic", fn),
        ("sort_route",
         jax.jit(jax.vmap(lambda p, v: scan_context_sort_route(p, v, cfg)))),
    ):
        def sink(o):
            float(jnp.sum(o[0, 0, :1]))

        sink(f(bx, bv))
        sink(f(bx, bv))
        t0 = time.perf_counter()
        outs = [f(bx, bv) for _ in range(ITERS)]
        for o in outs:
            sink(o)
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({"name": name, "ms": round(dt * 1e3, 2),
                          "us_per_scan": round(dt / B * 1e6, 1)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
