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

    folds = {
        "tiny_unet": [
            d for d in sorted(os.listdir(os.path.join(REPO, "runs")))
            if d.startswith("detector_ckpt_")
        ],
        "sc_unet": [
            d for d in sorted(os.listdir(os.path.join(REPO, "runs")))
            if d.startswith("detector_ckpt_c_")
        ],
    }
    # detector_ckpt_c_* are sc_unet; exclude them from the tiny_unet list
    folds["tiny_unet"] = [d for d in folds["tiny_unet"] if "_c_" not in d]

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
            post = "peaks" if model_name == "tiny_unet" else "banded"
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
