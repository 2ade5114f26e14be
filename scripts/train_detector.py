"""Train a working pedestrian detector on the shipped reference data.

The reference ships a checkpoint that detects NOTHING (tinycnn_best.pth,
max sigmoid ~0.059 on every bundled descriptor — SURVEY §6). This script
produces the first checkpoint in either repo with nonzero detections:

1. Assemble the training set from the reference's own data: the four
   golden test_data scans (descriptors + pedestrian labels) plus the
   unlabeled sample_data/999999.bin as a pure-background sample.
2. Train trainer B (TinyUNet center-heatmap, full-width sector-roll
   augmentation — train_sc_ped.py semantics) holding out golden scan
   002160 ENTIRELY for validation.
3. Report held-out center-matching P/R/F1 and run the end-to-end
   detect pipeline on 000840 + the held-out 002160.

Run on the TPU (default backend): python scripts/train_detector.py
"""

import dataclasses
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_DIR = os.path.join(REPO, "runs", "detector_data")
CKPT_DIR = os.path.join(REPO, "runs", "detector_ckpt")
VAL_ID = 2160  # held-out golden scan
EPOCHS = int(os.environ.get("DPC_DET_EPOCHS", "400"))
EVAL_EVERY = 10  # eval is host-bound matching; don't run it every epoch


def assemble_dataset():
    from distropointclouds_tpu.core.config import ScanContextConfig
    from distropointclouds_tpu.io import fixtures
    from distropointclouds_tpu.io.native import scan_context_host

    os.makedirs(DATA_DIR, exist_ok=True)
    for sid in fixtures.GOLDEN_IDS:
        for name in (f"sc_{sid}.npy", f"pedestrians_{sid}.json"):
            src = os.path.join(fixtures.test_data_dir(), name)
            shutil.copy(src, os.path.join(DATA_DIR, name))
    # Background sample: 999999.bin has no pedestrian labels.
    cfg = ScanContextConfig.golden_v2()
    raw = np.fromfile(
        os.path.join(fixtures.sample_data_dir(), "999999.bin"), np.float32
    ).reshape(-1, 4)
    sc = scan_context_host(raw, cfg)
    np.save(os.path.join(DATA_DIR, "sc_999999.npy"), sc.astype(np.float32))
    print(f"dataset assembled in {DATA_DIR}")


def main():
    from distropointclouds_tpu.core.config import TrainConfig
    from distropointclouds_tpu.train.data import load_scan_context_dir
    from distropointclouds_tpu.train.fit import fit

    assemble_dataset()
    data = load_scan_context_dir(DATA_DIR)
    print("samples:", data.ids)
    val_idx = np.asarray([data.ids.index(VAL_ID)])
    tr_idx = np.asarray([i for i in range(len(data)) if i != val_idx[0]])
    print(f"train ids: {[data.ids[i] for i in tr_idx]}, "
          f"val ids: {[data.ids[i] for i in val_idx]}")

    cfg = dataclasses.replace(
        TrainConfig.trainer_b(),
        epochs=EPOCHS,
        batch_size=len(tr_idx),
        ckpt_dir=CKPT_DIR,
    )
    state, final = fit(
        data,
        cfg,
        log_path=os.path.join(CKPT_DIR, "log.jsonl"),
        split=(tr_idx, val_idx, np.asarray([], np.int64)),
        eval_threshold=0.35,
    )

    # End-to-end demo: raw .bin -> descriptor -> TinyUNet -> peaks,
    # matched against the reference JSON centers.
    import jax.numpy as jnp

    from distropointclouds_tpu.core.config import DetectorConfig, PipelineConfig
    from distropointclouds_tpu.core.types import PointBatch
    from distropointclouds_tpu.io import fixtures
    from distropointclouds_tpu.pipeline import build_pipeline
    from distropointclouds_tpu.train import metrics as M
    from distropointclouds_tpu.train.checkpoint import CheckpointManager

    variables = CheckpointManager(CKPT_DIR).restore_variables("best")
    pipe_cfg = PipelineConfig(
        normalize="clip", detector=DetectorConfig(peak_threshold=0.35)
    )
    fn = jax.jit(build_pipeline("tiny_unet", pipe_cfg, postprocess="peaks"))
    results = {}
    for sid in ("000840", "002160"):
        pb = PointBatch.from_numpy(
            fixtures.golden_scan(sid), pipe_cfg.scan_context.max_points
        )
        out = fn(variables, pb)
        det = out["detections"]
        preds = [
            (float(r), float(s), float(v))
            for r, s, v, ok in zip(
                np.asarray(det.ring), np.asarray(det.sector),
                np.asarray(det.score), np.asarray(det.valid),
            )
            if ok
        ]
        gts = fixtures.golden_centers(sid)
        tp, fp, fn_ = M.match_centers(preds, gts)
        results[sid] = {
            "preds": len(preds), "tp": tp, "fp": fp, "fn": fn_,
            **M.precision_recall_f1(tp, fp, fn_),
        }
        print(f"detect {sid}: {results[sid]}")

    with open(os.path.join(CKPT_DIR, "detect_results.json"), "w") as f:
        json.dump({"val_metrics": final, "detect": results}, f, indent=2)
    print("final:", final)


if __name__ == "__main__":
    main()
