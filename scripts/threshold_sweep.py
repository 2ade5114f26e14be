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
# Trainer A grid: sigmoid mask threshold x min component pixels
# (tiny_sc_ped.py:196-234 — reference operating point 0.5 / 20 px).
A_MASK_THRESHOLDS = (0.6, 0.5, 0.4, 0.3, 0.2)
A_MIN_PIXELS = (5, 10, 20, 40)
# Trainer C banded threshold sets (near / mid / far rings,
# tiny_sc_pred_v2.py:697-700 — reference set 0.5/0.4/0.3): the
# reference's descending shape at shifted operating points, plus flat
# triples to expose what the band structure itself buys.
C_BAND_SETS = (
    (0.5, 0.4, 0.3),
    (0.45, 0.35, 0.25),
    (0.4, 0.3, 0.2),
    (0.35, 0.25, 0.15),
    (0.3, 0.2, 0.1),
    (0.5, 0.5, 0.5),
    (0.35, 0.35, 0.35),
    (0.2, 0.2, 0.2),
)


def scipy_component_detections(probs, thr, min_px):
    """Host-side reference-oracle component extraction
    (tiny_sc_ped.py:196-215): threshold -> scipy.ndimage.label ->
    keep components >= min_px -> pixel-centroid detections with AREA
    scores. scipy IS the reference implementation here, so the sweep's
    operating points are measured against the reference's own
    semantics (device components parity vs scipy is gated separately
    in tests/test_postprocess.py)."""
    from scipy import ndimage

    lab, n = ndimage.label(probs >= thr)
    dets = []
    for comp in range(1, n + 1):
        rr, ss = np.nonzero(lab == comp)
        if len(rr) < min_px:
            continue
        dets.append((float(rr.mean()), float(ss.mean()), float(len(rr))))
    return dets


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
    folds_a = sorted(
        d for d in os.listdir(os.path.join(REPO, "runs"))
        if re.fullmatch(r"detector_ckpt_a(?:_mix)?_\d{6}", d)
    )
    folds_c = sorted(
        d for d in os.listdir(os.path.join(REPO, "runs"))
        if re.fullmatch(r"detector_ckpt_c(?:_mix)?_\d{6}", d)
    )
    cfg = PipelineConfig(
        normalize="clip",
        compute_dtype="float32",  # threshold-critical eval: pin f32
        detector=DetectorConfig(peak_threshold=0.05),
    )
    fn = jax.jit(build_pipeline("tiny_unet", cfg, postprocess="peaks"))

    def fold_probs(fold, model_name):
        """Restore a fold checkpoint and run the end-to-end pipeline
        (raw .bin -> descriptor -> CNN -> sigmoid) on all four golden
        scans at pinned f32; returns {scan_id: (R, S) probs} or None if
        the checkpoint is unreadable."""
        mgr = CheckpointManager(os.path.join(REPO, "runs", fold))
        meta = {}
        meta_path = os.path.join(REPO, "runs", fold, "best.meta.json")
        if os.path.exists(meta_path):
            meta = json.load(open(meta_path)).get("metrics", {})
        sel = "f1" if model_name != "tiny_cnn" else "iou"
        tag = "best" if meta.get(sel, 0.0) > 0.0 else "last"
        try:
            variables = mgr.restore_variables(tag)
        except Exception as e:
            print(f"skip {fold}: {e}")
            return None, tag
        cfg_mm = PipelineConfig(normalize="minmax", compute_dtype="float32")
        fn_p = jax.jit(build_pipeline(model_name, cfg_mm, postprocess="none"))
        probs = {}
        for sid in fixtures.GOLDEN_IDS:
            pb = PointBatch.stack([
                PointBatch.from_numpy(
                    fixtures.golden_scan(sid), cfg_mm.scan_context.max_points
                )
            ])
            probs[sid] = np.asarray(fn_p(variables, pb)["probs"])[0]
        return probs, tag

    def match_row(dets, gts):
        tp, fp, fn_ = M.match_centers(dets, gts)
        return {
            "preds": len(dets), "tp": tp, "fp": fp, "fn": fn_,
            **{k: round(v, 4) for k, v in
               M.precision_recall_f1(tp, fp, fn_).items()},
        }

    def sweep_trainer_a(fold):
        """mask-threshold x min-px grid over a trainer-A (TinyCNN
        covered-cells segmentation) fold via the reference's own scipy
        component semantics."""
        probs, tag = fold_probs(fold, "tiny_cnn")
        if probs is None:
            return None
        val_id = fold.split("_")[-1]
        rec = {"tag": tag, "val_scan": val_id, "grid": "mask_thr x min_px",
               "scans": {}, "train_pooled": {}}
        pooled = {}
        for sid in fixtures.GOLDEN_IDS:
            gts = sorted(set(fixtures.golden_centers(sid)))
            row = {}
            for thr in A_MASK_THRESHOLDS:
                for mpx in A_MIN_PIXELS:
                    dets = scipy_component_detections(probs[sid], thr, mpx)
                    key = f"{thr}/{mpx}px"
                    row[key] = match_row(dets, gts)
                    if sid != val_id:
                        acc = pooled.setdefault(key, [0, 0, 0])
                        acc[0] += row[key]["tp"]
                        acc[1] += row[key]["fp"]
                        acc[2] += row[key]["fn"]
            rec["scans"][sid] = {
                "role": "VAL" if sid == val_id else "train", **row
            }
        for key, (tp, fp, fn_) in pooled.items():
            rec["train_pooled"][key] = {
                "tp": tp, "fp": fp, "fn": fn_,
                **{k: round(v, 4) for k, v in
                   M.precision_recall_f1(tp, fp, fn_).items()},
            }
        return rec

    def sweep_trainer_c(fold):
        """Banded-threshold sets over a trainer-C (ScanContextUNet)
        fold: near/mid/far ring-band thresholds -> mask -> components
        (min 20 px, the pipeline default) -> center matching, plus
        per-band pixel P/R/F1 against the JSON covered-cells masks
        (tiny_sc_pred_v2.py:303-410 range-stratified eval)."""
        from distropointclouds_tpu.labels.covered_cells import (
            mask_from_cell_rows,
        )

        probs, tag = fold_probs(fold, "sc_unet")
        if probs is None:
            return None
        val_id = fold.split("_")[-1]
        det_defaults = DetectorConfig()
        edges = det_defaults.band_edges  # (60, 120)
        rec = {"tag": tag, "val_scan": val_id,
               "grid": "banded thresholds (near/mid/far)", "scans": {},
               "train_pooled": {}}
        gt_masks = {}
        for sid in fixtures.GOLDEN_IDS:
            m = np.zeros((160, 720), np.uint8)
            for ped in fixtures.golden_pedestrians(sid):
                m |= mask_from_cell_rows(ped["covered_cells"])
            gt_masks[sid] = m.astype(bool)
        rings = np.arange(160)[:, None]
        band_of = np.zeros((160, 720), np.int32)
        band_of += rings >= edges[0]
        band_of += rings >= edges[1]
        pooled = {}
        for sid in fixtures.GOLDEN_IDS:
            gts = sorted(set(fixtures.golden_centers(sid)))
            row = {}
            for bands in C_BAND_SETS:
                thr_map = np.choose(band_of, bands)
                mask = probs[sid] >= thr_map
                dets = scipy_component_detections(
                    np.where(mask, 1.0, 0.0), 0.5,
                    det_defaults.min_component_pixels,
                )
                key = "/".join(str(b) for b in bands)
                entry = match_row(dets, gts)
                gm = gt_masks[sid]
                for b, nm in enumerate(("near", "mid", "far")):
                    sel = band_of == b
                    tp = int((mask & gm & sel).sum())
                    fp = int((mask & ~gm & sel).sum())
                    fn_ = int((~mask & gm & sel).sum())
                    entry[f"{nm}_pixel_f1"] = round(
                        M.precision_recall_f1(tp, fp, fn_)["f1"], 4
                    )
                row[key] = entry
                if sid != val_id:
                    acc = pooled.setdefault(key, [0, 0, 0])
                    acc[0] += entry["tp"]
                    acc[1] += entry["fp"]
                    acc[2] += entry["fn"]
            rec["scans"][sid] = {
                "role": "VAL" if sid == val_id else "train", **row
            }
        for key, (tp, fp, fn_) in pooled.items():
            rec["train_pooled"][key] = {
                "tp": tp, "fp": fp, "fn": fn_,
                **{k: round(v, 4) for k, v in
                   M.precision_recall_f1(tp, fp, fn_).items()},
            }
        return rec

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
    for fold in folds_a:
        rec = sweep_trainer_a(fold)
        if rec is None:
            continue
        sweep[fold] = rec
        ref_op = rec["train_pooled"].get("0.5/20px", {})
        print(f"{fold} [{rec['tag']}]: train-pooled @0.5/20px "
              f"f1={ref_op.get('f1')}")
    for fold in folds_c:
        rec = sweep_trainer_c(fold)
        if rec is None:
            continue
        sweep[fold] = rec
        ref_op = rec["train_pooled"].get("0.5/0.4/0.3", {})
        print(f"{fold} [{rec['tag']}]: train-pooled @0.5/0.4/0.3 "
              f"f1={ref_op.get('f1')}")
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
