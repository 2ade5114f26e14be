"""Attribute the regime-a gap between stage sums and end-to-end
throughput (r2 VERDICT next-round #1: ~30 us/scan unattributed).

Hypotheses probed on the real TPU:
  A. loop60  — the bench's own discipline (60 dispatches, fence last):
     baseline, uses the cached program.
  B. scan60  — the SAME pipeline body wrapped in ONE lax.scan program of
     length 60: zero per-program launch/dispatch cost inside the window.
     If scan60 >> loop60, the gap is per-program overhead (tunnel
     dispatch or device-side program launch), not pipeline compute.
     Hoist check: the descriptor is a Pallas custom-call (XLA's LICM
     will not hoist it out of the while loop), but if XLA somehow
     hoisted the invariant body the scan time would collapse to ~1
     iteration — detected and reported as `hoisted`.
  C. loop120 — doubles the window with the same cached program: isolates
     the fixed fence RTT + ramp share (expected ~+1-2% if that's all).

Run (TPU, quiet): timeout 3600 python scripts/bench_dispatch_probe.py
Batch sweep mode:  DPC_PROBE_SWEEP=112,136,144 adds a fine batch sweep
(each size is a fresh remote compile, ~4-15 min — budget accordingly).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = int(os.environ.get("DPC_BENCH_BATCH", "128"))
ITERS = 60


def build(batch_size):
    from distropointclouds_tpu.core.config import PipelineConfig
    from distropointclouds_tpu.core.types import PointBatch
    from distropointclouds_tpu.io import fixtures
    from distropointclouds_tpu.models.torch_import import load_tiny_cnn
    from distropointclouds_tpu.pipeline import build_pipeline

    cfg = PipelineConfig()
    inner = build_pipeline("tiny_cnn", cfg, "components")
    variables = load_tiny_cnn()
    pbs = [
        PointBatch.from_numpy(
            fixtures.golden_scan(s), cfg.scan_context.max_points
        )
        for s in fixtures.GOLDEN_IDS
    ]
    batch = PointBatch.stack([pbs[i % len(pbs)] for i in range(batch_size)])
    return inner, variables, jax.device_put(batch)


def loop_sps(fn, variables, batch, iters):
    for _ in range(3):
        float(jnp.sum(fn(variables, batch)["probs"][:, 0, 0]))
    t0 = time.perf_counter()
    outs = [fn(variables, batch) for _ in range(iters)]
    f = float(jnp.sum(outs[-1]["probs"][:, 0, 0]))
    dt = time.perf_counter() - t0
    assert np.isfinite(f)
    return int(batch.xyzi.shape[0]) * iters / dt


def main():
    from distropointclouds_tpu.core.types import PointBatch

    inner, variables, batch = build(BATCH)
    fn = jax.jit(inner)

    a = loop_sps(fn, variables, batch, ITERS)
    print(json.dumps({"probe": "loop60", "scans_per_sec": round(a, 1)}),
          flush=True)

    c = loop_sps(fn, variables, batch, 2 * ITERS)
    print(json.dumps({"probe": "loop120", "scans_per_sec": round(c, 1)}),
          flush=True)

    @jax.jit
    def scan_fn(variables, batch):
        def body(acc, _):
            # Carry-dependent zero: acc * 0.0 is NOT folded for floats
            # (NaN semantics), so `count` depends on the previous
            # iteration and XLA's while-loop LICM cannot hoist the
            # pipeline body. Numerically a no-op (acc stays finite).
            eps = (acc * jnp.float32(0.0)).astype(jnp.int32)
            pts = PointBatch(xyzi=batch.xyzi, count=batch.count + eps)
            out = inner(variables, pts)
            return acc + jnp.sum(out["probs"][:, 0, 0]), None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0), None, length=ITERS
        )
        return acc

    t0 = time.perf_counter()
    f = float(scan_fn(variables, batch))  # includes compile
    compile_s = time.perf_counter() - t0
    assert np.isfinite(f)
    t0 = time.perf_counter()
    f = float(scan_fn(variables, batch))
    dt = time.perf_counter() - t0
    b = int(batch.xyzi.shape[0]) * ITERS / dt
    # hoist detection: honest scan60 must cost at least ~25% of loop60's
    # window; a hoisted body collapses to ~1/60.
    hoisted = dt < 0.25 * (int(batch.xyzi.shape[0]) * ITERS / a)
    print(json.dumps({
        "probe": "scan60", "scans_per_sec": round(b, 1),
        "compile_s": round(compile_s, 1), "hoisted": bool(hoisted),
    }), flush=True)

    for bs in filter(None, os.environ.get("DPC_PROBE_SWEEP", "").split(",")):
        bs = int(bs)
        inner2, v2, batch2 = build(bs)
        sps = loop_sps(jax.jit(inner2), v2, batch2, ITERS)
        print(json.dumps({"probe": f"batch{bs}", "scans_per_sec": round(sps, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
