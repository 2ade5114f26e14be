"""Attribute the detecting-regime cost (bench regime b): how much is
the TinyUNet forward vs the full components path on real detecting
masks. Times, at the bench batch:

  1. descriptor only            (cache-shared with bench stage probe)
  2. descriptor + TinyUNet      (postprocess="none")
  3. full pipeline w/ components (regime b's exact program)

Run on the TPU: python scripts/bench_tiny_unet_stages.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

BATCH = int(os.environ.get("DPC_BENCH_BATCH", "128"))
ITERS = int(os.environ.get("DPC_BENCH_ITERS", "20"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    from distropointclouds_tpu.core.config import DetectorConfig, PipelineConfig
    from distropointclouds_tpu.core.types import PointBatch
    from distropointclouds_tpu.io import fixtures
    from distropointclouds_tpu.pipeline import build_pipeline
    from distropointclouds_tpu.train.checkpoint import CheckpointManager

    variables = CheckpointManager(
        os.path.join(REPO, "runs", "detector_ckpt_002073")
    ).restore_variables("best")
    cfg = dataclasses.replace(
        PipelineConfig(),
        normalize="clip",
        detector=dataclasses.replace(DetectorConfig(), mask_threshold=0.35),
    )
    pbs = [
        PointBatch.from_numpy(
            fixtures.golden_scan(s), cfg.scan_context.max_points
        )
        for s in fixtures.GOLDEN_IDS
    ]
    batch = jax.device_put(
        PointBatch.stack([pbs[i % len(pbs)] for i in range(BATCH)])
    )

    def fence(out):
        return float(jnp.sum(out["probs"][:, 0, 0]))

    results = {}
    for name, post in (("forward_only", "none"), ("components", "components")):
        fn = jax.jit(build_pipeline("tiny_unet", cfg, postprocess=post))
        for _ in range(3):
            fence(fn(variables, batch))
        t0 = time.perf_counter()
        outs = [fn(variables, batch) for _ in range(ITERS)]
        fence(outs[-1])
        dt = time.perf_counter() - t0
        sps = BATCH * ITERS / dt
        results[name] = {
            "scans_per_sec": round(sps, 1),
            "us_per_scan": round(1e6 / sps, 1),
        }
        print(name, results[name], flush=True)
    results["components_extra_us_per_scan"] = round(
        results["components"]["us_per_scan"]
        - results["forward_only"]["us_per_scan"], 1
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
