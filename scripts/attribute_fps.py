"""Attribute a detector checkpoint's false positives on the golden scans.

r4 measured the synthgen_v2 sim-to-real result (aggregate dedup F1 0.08,
42 false positives at thr 0.35) but recorded nothing about WHAT those
false positives are — and the answer is what aims the next generator
iteration (r4 VERDICT weak #5). This script closes that loop with the
framework's own inversion semantics: every FP peak's local descriptor
window IS a max-height point cloud over polar cell centers
(reconstruct_pointcloud.py:47-77 / ops/invert.py), so scene content can
be bucketed directly from the grid:

- ring band (near/mid/far — the banded-eval ranges 0-7.5/7.5-15/15-20 m)
- local max height z_max (KITTI velo frame, sensor at ~1.73 m: ground
  ~ -1.7, car roofs ~ -0.3, pedestrian heads ~ 0.2, buildings/trees > 1)
- occupied-cell footprint of the window

Heuristic content classes (documented, not learned):
  tall_structure  z_max >= 0.8        building facade / tree / pole
  mid_surface     -0.5 <= z_max < 0.8  car-height surfaces, ped-like
  low_clutter     z_max < -0.5        ground-level clutter

Writes runs/fp_attribution_<name>.json and prints the bucket table.

Usage:
  [DPC_ATTR_CKPT=runs/detector_ckpt_synthgen_v2] \
  [JAX_PLATFORMS=cpu] python scripts/attribute_fps.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD = float(os.environ.get("DPC_ATTR_THR", "0.35"))
WIN_R, WIN_S = 4, 10  # attribution window: +-4 rings x +-10 sectors


def greedy_match_flags(preds, gts, max_r=3, max_s=6, num_sector=720):
    """train_sc_ped.py:312-340 greedy wrap-aware matching, returning a
    per-pred is-TP flag (metrics.match_centers returns only counts)."""
    used = set()
    flags = []
    for r, s, _ in preds:
        best, best_d = -1, (np.inf, np.inf)
        for i, (gr, gs) in enumerate(gts):
            if i in used:
                continue
            dr = abs(int(r) - int(gr))
            ds = abs(int(s) - int(gs))
            ds = min(ds, num_sector - ds)
            if dr <= max_r and ds <= max_s and (dr, ds) < best_d:
                best_d, best = (dr, ds), i
        if best >= 0:
            used.add(best)
        flags.append(best >= 0)
    return flags


def classify(z_max):
    if z_max >= 0.8:
        return "tall_structure"
    if z_max >= -0.5:
        return "mid_surface"
    return "low_clutter"


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from distropointclouds_tpu.core.config import DetectorConfig, PipelineConfig
    from distropointclouds_tpu.core.types import PointBatch
    from distropointclouds_tpu.io import fixtures
    from distropointclouds_tpu.pipeline import build_pipeline
    from distropointclouds_tpu.train.checkpoint import CheckpointManager

    ckpt_dir = os.environ.get(
        "DPC_ATTR_CKPT", os.path.join(REPO, "runs", "detector_ckpt_synthgen_v2")
    )
    name = os.path.basename(ckpt_dir).replace("detector_ckpt_", "")
    variables = CheckpointManager(ckpt_dir).restore_variables("best")
    cfg = PipelineConfig(
        normalize="clip",
        compute_dtype="float32",
        detector=DetectorConfig(peak_threshold=THRESHOLD),
    )
    fn = jax.jit(build_pipeline("tiny_unet", cfg, postprocess="peaks"))

    gap_ring = cfg.scan_context.gap_ring
    band_edges = (60, 120)  # tiny_sc_pred_v2.py:316-321 ring bands
    fps = []
    counts = {"tp": 0, "fp": 0}
    for sid in fixtures.GOLDEN_IDS:
        pb = PointBatch.stack([
            PointBatch.from_numpy(
                fixtures.golden_scan(sid), cfg.scan_context.max_points
            )
        ])
        out = fn(variables, pb)
        det = out["detections"]
        grid = np.asarray(out["descriptor"])[0]
        preds = [
            (float(r), float(s), float(v))
            for r, s, v, ok in zip(
                np.asarray(det.ring)[0], np.asarray(det.sector)[0],
                np.asarray(det.score)[0], np.asarray(det.valid)[0],
            )
            if ok and float(v) >= THRESHOLD
        ]
        gts = sorted(set(fixtures.golden_centers(sid)))
        flags = greedy_match_flags(preds, gts)
        for (r, s, score), is_tp in zip(preds, flags):
            counts["tp" if is_tp else "fp"] += 1
            if is_tp:
                continue
            ri, si = int(r), int(s)
            r0, r1 = max(0, ri - WIN_R), min(160, ri + WIN_R + 1)
            cols = (np.arange(si - WIN_S, si + WIN_S + 1)) % 720
            win = grid[r0:r1][:, cols]
            occ = win != 0.0
            z_max = float(win[occ].max()) if occ.any() else 0.0
            band = int(ri >= band_edges[0]) + int(ri >= band_edges[1])
            fps.append(
                {
                    "scan": sid,
                    "ring": ri,
                    "sector": si,
                    "score": round(score, 3),
                    "distance_m": round((ri + 0.5) * gap_ring, 2),
                    "band": ("near", "mid", "far")[band],
                    "z_max": round(z_max, 2),
                    "occupied_cells": int(occ.sum()),
                    "class": classify(z_max),
                }
            )

    # Bucket table: class x band.
    table = {}
    for f in fps:
        key = f"{f['class']}/{f['band']}"
        table[key] = table.get(key, 0) + 1
    by_class = {}
    for f in fps:
        by_class[f["class"]] = by_class.get(f["class"], 0) + 1
    by_scan = {}
    for f in fps:
        by_scan[f["scan"]] = by_scan.get(f["scan"], 0) + 1

    out_path = os.path.join(REPO, "runs", f"fp_attribution_{name}.json")
    import datetime

    payload = {
        "ckpt": ckpt_dir,
        "threshold": THRESHOLD,
        "tp": counts["tp"],
        "fp": counts["fp"],
        "by_class": by_class,
        "by_class_band": dict(sorted(table.items())),
        "by_scan": by_scan,
        "false_positives": fps,
        "_provenance": {
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
            "date": datetime.date.today().isoformat(),
        },
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: payload[k] for k in
                      ("tp", "fp", "by_class", "by_class_band", "by_scan")},
                     indent=2))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
