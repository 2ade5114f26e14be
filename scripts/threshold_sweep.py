"""Per-fold peak-threshold sweep (PR curve) for the trainer-B detector
folds (r2 VERDICT weak #4: folds were quoted at whichever threshold
regime worked; fold 002160 produced 0 predictions at the reference eval
threshold 0.35 on its own training scans).

For every runs/detector_ckpt_<fold> (TinyUNet), runs the end-to-end
pipeline (raw .bin -> descriptor -> TinyUNet -> peaks) on all four
golden scans and reports predictions / P / R / F1 (vs deduplicated GT
centers) at a ladder of thresholds, per scan and pooled over the
training scans. Writes runs/threshold_sweep.json.

Provenance note: the COMMITTED runs/threshold_sweep.json was produced
on the TPU at matmul_precision float32. A CPU rerun
(JAX_PLATFORMS=cpu) is numerically valid but flips a handful of
near-threshold prediction counts (CPU convs default to a higher
effective f32 precision than the TPU float32 MXU pass), so regenerate
the committed artifact on the TPU for apples-to-apples history.
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLDS = (0.5, 0.45, 0.4, 0.35, 0.3, 0.25, 0.2, 0.15, 0.1)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    if os.environ.get("JAX_PLATFORMS"):
        # Honor the explicit platform request the docstring promises: a
        # sitecustomize hook re-registers the tunneled TPU after env
        # parsing (CLAUDE.md), so the env var alone does nothing — and
        # during a tunnel outage the sweep would hang in backend init.
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from distropointclouds_tpu.core.config import DetectorConfig, PipelineConfig
    from distropointclouds_tpu.core.types import PointBatch
    from distropointclouds_tpu.io import fixtures
    from distropointclouds_tpu.pipeline import build_pipeline
    from distropointclouds_tpu.train import metrics as M
    from distropointclouds_tpu.train.checkpoint import CheckpointManager

    # Trainer-B (TinyUNet) folds only: detector_ckpt_<6 digits>, plus
    # the synthetic-corpus-mixed variants detector_ckpt_mix_<6 digits>
    # (same architecture, trained with DPC_DET_MIX_SYNTH).
    # detector_ckpt_c_* are sc_unet and detector_ckpt_a_* are tiny_cnn
    # checkpoints — restoring either into the tiny_unet pipeline would
    # fail on the flax param-structure mismatch.
    folds = sorted(
        d for d in os.listdir(os.path.join(REPO, "runs"))
        if re.fullmatch(r"detector_ckpt_(?:mix_)?\d{6}", d)
    )
    cfg = PipelineConfig(
        normalize="clip",
        compute_dtype="float32",  # threshold-critical eval: pin f32
        detector=DetectorConfig(peak_threshold=0.05),
    )
    fn = jax.jit(build_pipeline("tiny_unet", cfg, postprocess="peaks"))

    sweep = {}
    for fold in folds:
        mgr = CheckpointManager(os.path.join(REPO, "runs", fold))
        meta = {}
        meta_path = os.path.join(REPO, "runs", fold, "best.meta.json")
        if os.path.exists(meta_path):
            meta = json.load(open(meta_path)).get("metrics", {})
        tag = "best" if meta.get("f1", 0.0) > 0.0 else "last"
        try:
            variables = mgr.restore_variables(tag)
        except Exception as e:
            print(f"skip {fold}: {e}")
            continue
        val_id = fold.split("_")[-1]
        rec = {"tag": tag, "val_scan": val_id, "scans": {}, "train_pooled": {}}
        pooled = {t: [0, 0, 0] for t in THRESHOLDS}
        for sid in fixtures.GOLDEN_IDS:
            pb = PointBatch.stack([
                PointBatch.from_numpy(
                    fixtures.golden_scan(sid), cfg.scan_context.max_points
                )
            ])
            det = fn(variables, pb)["detections"]
            preds_all = [
                (float(r), float(s), float(v))
                for r, s, v, ok in zip(
                    np.asarray(det.ring)[0], np.asarray(det.sector)[0],
                    np.asarray(det.score)[0], np.asarray(det.valid)[0],
                )
                if ok
            ]
            gts = sorted(set(fixtures.golden_centers(sid)))
            row = {}
            for t in THRESHOLDS:
                preds = [p for p in preds_all if p[2] >= t]
                tp, fp, fn_ = M.match_centers(preds, gts)
                row[str(t)] = {
                    "preds": len(preds), "tp": tp, "fp": fp, "fn": fn_,
                    **{k: round(v, 4) for k, v in
                       M.precision_recall_f1(tp, fp, fn_).items()},
                }
                if sid != val_id:
                    pooled[t][0] += tp
                    pooled[t][1] += fp
                    pooled[t][2] += fn_
            rec["scans"][sid] = {
                "role": "VAL" if sid == val_id else "train", **row
            }
        for t, (tp, fp, fn_) in pooled.items():
            rec["train_pooled"][str(t)] = {
                "tp": tp, "fp": fp, "fn": fn_,
                **{k: round(v, 4) for k, v in
                   M.precision_recall_f1(tp, fp, fn_).items()},
            }
        sweep[fold] = rec
        at35 = rec["train_pooled"]["0.35"]
        print(
            f"{fold} [{tag}]: train-pooled @0.35 "
            f"preds={at35['tp'] + at35['fp']} f1={at35['f1']}"
        )
    import datetime

    sweep["_provenance"] = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "matmul_precision": "float32 (pinned via compute_dtype)",
        "date": datetime.date.today().isoformat(),
        "folds": {f: sweep[f]["tag"] for f in sweep if not f.startswith("_")},
    }
    out = os.path.join(REPO, "runs", "threshold_sweep.json")
    with open(out, "w") as f:
        json.dump(sweep, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
