"""Attribute the ~187 us/scan postprocess cost (B=96, empty masks —
the bench's actual regime with the shipped checkpoint)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from distropointclouds_tpu.ops.postprocess import (
    _component_stats_onehot,
    components_to_detections,
    connected_components,
)

B, H, W = 96, 160, 720
ITERS = 8


def timed(name, fn, *args):
    fn_j = jax.jit(fn)

    def sink(o):
        leaf = jax.tree.leaves(o)[0]
        float(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32)))

    sink(fn_j(*args))
    sink(fn_j(*args))
    t0 = time.perf_counter()
    outs = [fn_j(*args) for _ in range(ITERS)]
    # The device stream is in-order: fencing only the LAST output forces
    # everything before it, paying ONE tunnel RTT instead of ITERS.
    sink(outs[-1])
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"name": name, "ms": round(dt * 1e3, 2),
                      "us_per_scan": round(dt / B * 1e6, 1)}))
    sys.stdout.flush()


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    # empty masks (the shipped-checkpoint bench regime) and sparse masks
    empty = jnp.zeros((B, H, W), bool)
    sparse = jnp.asarray(rng.uniform(size=(B, H, W)) < 0.001)

    for name, mask in (("empty", empty), ("sparse", sparse)):
        timed(f"cc_only_{name}",
              jax.vmap(lambda m: connected_components(m, 64)), mask)
        timed(f"components_full_{name}",
              jax.vmap(lambda m: components_to_detections(
                  m, 20, capacity=64, max_iters=64)), mask)

    # top_k root selection alone (the suspected cost)
    flat = jnp.arange(H * W, dtype=jnp.int32)
    scores = jnp.broadcast_to(-(flat[None, :]) - 1, (B, H * W))
    timed("topk64_of_115200", lambda s: jax.lax.top_k(s, 64), scores)


if __name__ == "__main__":
    main()
