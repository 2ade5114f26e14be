"""Measure the bf16-vs-f32 inference delta for the DETECTOR models
(r2 ADVICE low: the bf16 compute_dtype default was only measured for
TinyCNN; detector models trained in f32 now serve in bf16, which could
flip near-threshold detections).

For each trained detector checkpoint found under runs/, runs the full
pipeline on all four golden scans at compute_dtype float32 vs bfloat16
and reports: max |prob delta|, and the detection sets at the reference
eval threshold (0.35) and the demo threshold (0.15) — flips counted as
symmetric difference of (ring, sector) peak cells.

Run on the TPU (default backend): python scripts/bench_detector_precision.py
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS"):
    # honor an explicit platform request despite the sitecustomize hook
    # that re-registers the tunneled TPU after env parsing (CLAUDE.md)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def detection_set(det, thr):
    return {
        (round(float(r)), round(float(s)))
        for r, s, v, ok in zip(
            np.asarray(det.ring).ravel(),
            np.asarray(det.sector).ravel(),
            np.asarray(det.score).ravel(),
            np.asarray(det.valid).ravel(),
        )
        if ok and float(v) >= thr
    }


def main():
    import jax.numpy as jnp

    from distropointclouds_tpu.core.config import DetectorConfig, PipelineConfig
    from distropointclouds_tpu.core.types import PointBatch
    from distropointclouds_tpu.io import fixtures
    from distropointclouds_tpu.pipeline import build_pipeline
    from distropointclouds_tpu.train.checkpoint import CheckpointManager

    # Route each fold dir to the model family that trained it:
    # detector_ckpt_<6 digits> = trainer B (tiny_unet), _c_* = trainer C
    # (sc_unet), _a_* = trainer A (tiny_cnn) — restoring across families
    # fails on the flax param-structure mismatch.
    import re

    run_dirs = sorted(os.listdir(os.path.join(REPO, "runs")))
    folds = {
        "tiny_unet": [d for d in run_dirs if re.fullmatch(r"detector_ckpt_\d{6}", d)],
        "sc_unet": [d for d in run_dirs if d.startswith("detector_ckpt_c_")],
        "tiny_cnn": [d for d in run_dirs if d.startswith("detector_ckpt_a_")],
    }

    results = {}
    for model_name, dirs in folds.items():
        for d in dirs:
            ckpt = os.path.join(REPO, "runs", d)
            mgr = CheckpointManager(ckpt)
            tag = "best" if mgr.has("best") else "last"
            try:
                variables = mgr.restore_variables(tag)
            except Exception as e:
                print(f"skip {d}: {e}")
                continue
            normalize = "clip" if model_name == "tiny_unet" else "minmax"
            post = {
                "tiny_unet": "peaks",   # heatmap peak NMS (trainer B)
                "sc_unet": "banded",    # ring-banded thresholds (trainer C)
                "tiny_cnn": "components",  # mask -> CC (trainer A)
            }[model_name]
            outs = {}
            for dtype in ("float32", "bfloat16"):
                cfg = PipelineConfig(
                    normalize=normalize,
                    compute_dtype=dtype,
                    detector=DetectorConfig(peak_threshold=0.15),
                )
                fn = jax.jit(build_pipeline(model_name, cfg, postprocess=post))
                pbs = [
                    PointBatch.from_numpy(
                        fixtures.golden_scan(s), cfg.scan_context.max_points
                    )
                    for s in fixtures.GOLDEN_IDS
                ]
                outs[dtype] = jax.block_until_ready(
                    fn(variables, PointBatch.stack(pbs))
                )
            pf = np.asarray(outs["float32"]["probs"], np.float32)
            pb = np.asarray(outs["bfloat16"]["probs"], np.float32)
            rec = {"max_prob_delta": float(np.max(np.abs(pf - pb)))}
            for thr in (0.35, 0.15):
                a = detection_set(outs["float32"]["detections"], thr)
                b = detection_set(outs["bfloat16"]["detections"], thr)
                rec[f"thr{thr}"] = {
                    "f32_dets": len(a),
                    "bf16_dets": len(b),
                    "flips": len(a ^ b),
                }
            results[f"{model_name}:{d}"] = rec
            print(f"{model_name} {d} [{tag}]:", json.dumps(rec))
    out_path = os.path.join(REPO, "runs", "detector_precision.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
