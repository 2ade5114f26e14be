"""Train a working pedestrian detector on the shipped reference data.

The reference ships a checkpoint that detects NOTHING (tinycnn_best.pth,
max sigmoid ~0.059 on every bundled descriptor — SURVEY §6). This script
produces the first checkpoint in either repo with nonzero detections:

1. Assemble the training set from the reference's own data: the four
   golden test_data scans (descriptors + pedestrian labels) plus the
   unlabeled sample_data/999999.bin as a pure-background sample.
2. Train trainer B (TinyUNet center-heatmap, full-width sector-roll
   augmentation — train_sc_ped.py semantics) holding out golden scan
   002160 ENTIRELY as the TEST scan.
3. Report held-out center-matching P/R/F1 and run the end-to-end
   detect pipeline on 000840 + the held-out 002160.

Evaluation protocol (r5, matching the reference's own
train_sc_ped.py:491-492,544-548 — best.pt by *val* metric, final
report on a *separate* test split): the checkpoint is selected by
train-pooled F1 (the three golden TRAIN scans, which also sit in the
training set — identical selection signal for base and mix folds, so
mix-vs-base deltas stay clean), and the held-out scan's F1 is reported
at that fixed checkpoint. The held-out scan is also evaluated each
eval epoch and its max-over-epochs F1 is logged as
``test_f1_biased_max`` — the number the pre-r5 protocol (selection on
the reported scan) would have headlined, kept as an explicitly labeled
optimistic upper bound.

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
if os.environ.get("JAX_PLATFORMS"):
    # honor an explicit platform request despite the sitecustomize hook
    # that re-registers the tunneled TPU after env parsing (CLAUDE.md);
    # lets folds run/evaluate on CPU during a tunnel outage.
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_DIR = os.path.join(REPO, "runs", "detector_data")
VAL_ID = 2160  # held-out golden scan (override: DPC_DET_VAL=2073 etc.)
_VAL = int(os.environ.get("DPC_DET_VAL", VAL_ID))
# DPC_DET_TRAINER=b (TinyUNet heatmap, default) | c (ScanContextUNet
# covered-cells segmentation, polar convs + banded-threshold inference)
# | a (TinyCNN covered-cells segmentation, mask->connected-components
# inference — tiny_sc_ped.py semantics; the reference's own shipped
# trainer-A checkpoint detects nothing, SURVEY §6)
TRAINER = os.environ.get("DPC_DET_TRAINER", "b")
# DPC_DET_MIX_SYNTH=<scan_context dir>: mix an at-scale synthetic corpus
# (e.g. runs/synthgen_kitti_v2/training/scan_context) into the fold's
# training set. The held-out golden scan stays out of training entirely.
# DPC_DET_MIX_N caps the number of mixed scans (corpus-scaling curve:
# prefix subsets of one corpus isolate the size effect).
MIX_SYNTH = os.environ.get("DPC_DET_MIX_SYNTH", "")
MIX_N = int(os.environ.get("DPC_DET_MIX_N", "0"))  # 0 = all
# DPC_DET_FAST=1: train TinyUNet on the 80x360 fast-profile grid
# (PipelineConfig.fast()'s maxpool2x2-of-golden descriptor). The r4
# level probe (runs/tiny_unet_levels.json) shows the full-res stem +
# u0 head are 62% of model time at 5-10 TFLOP/s (MXU-starved 32-channel
# convs at 160x720); halving the grid quarters exactly that work. The
# detecting-fast bench regime pairs this checkpoint with the fast
# descriptor; accuracy is gated on held-out F1 vs the matching
# full-res fold under the same unbiased protocol.
FAST = os.environ.get("DPC_DET_FAST") == "1"
_SUFFIX = "" if TRAINER == "b" else f"_{TRAINER}"
if FAST:
    _SUFFIX += "_fast"
if MIX_SYNTH:
    _SUFFIX += "_mix"
CKPT_DIR = os.environ.get(
    "DPC_DET_CKPT_DIR",
    os.path.join(REPO, "runs", f"detector_ckpt{_SUFFIX}_{_VAL:06d}"),
)
EPOCHS = int(os.environ.get("DPC_DET_EPOCHS", "240" if TRAINER == "b" else "120"))
EVAL_EVERY = int(os.environ.get("DPC_DET_EVAL_EVERY", "10"))
# eval is host-bound greedy matching; running it every Nth epoch (final
# epoch always runs) cuts a 300-epoch fold's eval cost ~N-fold on this
# 1-core host. Checkpoint selection ticks on evaluated epochs only.


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


N_SYNTH = int(os.environ.get("DPC_DET_SYNTH", "384"))


def augment_dataset(exclude: str = "002160"):
    """Descriptor-space copy-paste augmentation: pedestrian cell patches
    from the labeled TRAIN scans are rotated to random sectors (same
    rings — a sector rotation of a polar patch is physically exact) and
    pasted (max-composited, matching scatter-max semantics) onto real
    train backgrounds. The held-out validation scan is never touched.
    """
    import json as _json

    import glob as _glob

    for stale in _glob.glob(os.path.join(DATA_DIR, "*_8?????.npy")):
        os.remove(stale)
    for stale in _glob.glob(os.path.join(DATA_DIR, "*_8?????.json")):
        os.remove(stale)

    rng = np.random.default_rng(7)
    train_ids = [
        s for s in ("000840", "002073", "002095", "002160") if s != exclude
    ]
    backgrounds = train_ids + ["999999"]
    scs = {s: np.load(os.path.join(DATA_DIR, f"sc_{s}.npy")) for s in backgrounds}
    peds_by_scan = {
        s: _json.load(open(os.path.join(DATA_DIR, f"pedestrians_{s}.json")))
        for s in train_ids
    }
    peds_by_scan["999999"] = []
    # Unique pedestrian patches (drop the reference's duplicate entries
    # by center cell).
    patches = []
    for s, peds in peds_by_scan.items():
        seen = set()
        for ped in peds:
            key = (ped["center_ring_idx"], ped["center_sector_idx"])
            if key in seen:
                continue
            seen.add(key)
            cells = np.asarray(ped["covered_cells"], np.int64).reshape(-1, 2)
            ok = (cells[:, 0] >= 0) & (cells[:, 0] < 160) & (
                cells[:, 1] >= 0) & (cells[:, 1] < 720)
            cells = cells[ok]
            if len(cells) < 2:
                continue
            patches.append(
                {
                    "cells": cells,
                    "values": scs[s][cells[:, 0], cells[:, 1]],
                    "center": (int(ped["center_ring_idx"]),
                               int(ped["center_sector_idx"])),
                    "meta": {k: ped[k] for k in
                             ("x", "y", "z", "h", "w", "l", "yaw", "distance")},
                }
            )
    print(f"augmentation pool: {len(patches)} unique pedestrian patches")

    for i in range(N_SYNTH):
        bg_id = backgrounds[rng.integers(len(backgrounds))]
        sc = scs[bg_id].copy()
        # random global sector roll of the background
        roll = int(rng.integers(720))
        sc = np.roll(sc, roll, axis=1)
        # The background's own real pedestrians ride along under the
        # roll and MUST stay labeled: omitting them (the r2 bug) fed
        # every real train-scan pedestrian to the loss as a hard
        # negative in ~N_SYNTH/len(backgrounds) rolled copies, which
        # actively suppressed the train scans' true peaks (measured:
        # fold-002160 maxprob 0.14-0.22 on its own training scans vs
        # 0.97 on the never-suppressed held-out scan).
        out_peds = []
        for ped in peds_by_scan[bg_id]:
            cells = np.asarray(ped["covered_cells"], np.int64).reshape(-1, 2)
            rolled = {
                **ped,
                "center_sector_idx": int(
                    (ped["center_sector_idx"] + roll) % 720),
                "covered_cells": np.stack(
                    [cells[:, 0], (cells[:, 1] + roll) % 720], 1).tolist(),
            }
            out_peds.append(rolled)
        for _ in range(int(rng.integers(1, 7))):
            p = patches[rng.integers(len(patches))]
            cr, cs = p["center"]
            rr = p["cells"][:, 0].copy()
            ss = p["cells"][:, 1].copy()
            vals = p["values"].copy()
            # sector mirror about the patch center (a reflected
            # pedestrian is an equally valid pedestrian)
            if rng.random() < 0.5:
                ss = 2 * cs - ss
            # radial jitter: +-6 rings (+-0.75 m) — the patch footprint
            # is approximately shift-invariant over that range
            dr = int(rng.integers(-6, 7))
            rr = rr + dr
            # sector rotation (exact for a polar grid)
            off = int(rng.integers(720))
            ss = (ss + off) % 720
            # height jitter + 10% cell dropout (partial occlusion)
            vals = vals + rng.uniform(-0.15, 0.15)
            keep = (rr >= 0) & (rr < 160) & (
                rng.random(len(rr)) >= (0.10 if len(rr) > 6 else 0.0))
            rr, ss, vals = rr[keep], ss[keep], vals[keep]
            if len(rr) < 2:
                continue
            sc[rr, ss] = np.maximum(sc[rr, ss], vals)
            out_peds.append(
                {
                    "class": "Pedestrian",
                    **p["meta"],
                    "center_ring_idx": int(np.clip(cr + dr, 0, 159)),
                    "center_sector_idx": int((cs + off) % 720),
                    "covered_cells": np.stack([rr, ss], 1).tolist(),
                }
            )
        sid = 800000 + i
        np.save(os.path.join(DATA_DIR, f"sc_{sid:06d}.npy"),
                sc.astype(np.float32))
        with open(os.path.join(DATA_DIR, f"pedestrians_{sid:06d}.json"),
                  "w") as f:
            _json.dump(out_peds, f)
    print(f"wrote {N_SYNTH} augmented samples")


def clear_mixed():
    """Remove the 7xxxxx id range. Must run for BASE folds too: a mix
    fold leaves its copied corpus in the shared DATA_DIR, and a later
    base run would silently train on it (caught in r5 by an index-count
    check: 279 samples where a base fold expects 9)."""
    import glob as _glob

    for stale in _glob.glob(os.path.join(DATA_DIR, "*_7?????.npy")):
        os.remove(stale)
    for stale in _glob.glob(os.path.join(DATA_DIR, "*_7?????.json")):
        os.remove(stale)


def mix_synthetic(src: str):
    """Copy an external scan_context corpus into DATA_DIR under the
    7xxxxx id range (goldens keep their KITTI ids, descriptor-space
    rolls live at 8xxxxx). Training-set-only by construction: the val
    index below selects the held-out golden id."""
    import glob as _glob

    clear_mixed()
    n = 0
    for f in sorted(_glob.glob(os.path.join(src, "sc_*.npy"))):
        sid = os.path.basename(f)[3:-4]
        ped = os.path.join(src, f"pedestrians_{sid}.json")
        if not os.path.exists(ped):
            continue
        nid = 700000 + n
        shutil.copy(f, os.path.join(DATA_DIR, f"sc_{nid:06d}.npy"))
        shutil.copy(ped, os.path.join(DATA_DIR, f"pedestrians_{nid:06d}.json"))
        n += 1
        if MIX_N and n >= MIX_N:
            break
    print(f"mixed in {n} synthetic samples from {src}")


def downsample_half(data):
    """Half-res twin of the training set for the fast-profile grid:
    maxpool2x2 descriptors (exactly the fast descriptor's cell contract,
    ScanContextConfig.fast: bin edges align so each coarse cell is the
    union of a 2x2 golden block) with halved center/cell indices.
    Invalid cell rows stay -1 (-1 // 2 == -1 under floor division)."""
    n = len(data)
    sc = data.sc.reshape(n, 80, 2, 360, 2).max(axis=(2, 4))
    cells = None if data.cells is None else (data.cells // 2).astype(np.int16)
    return type(data)(
        sc=sc.astype(np.float32),
        centers=np.floor(data.centers / 2.0).astype(np.float32),
        boxes=data.boxes,
        distance=data.distance,
        num_cells=data.num_cells,
        ped_valid=data.ped_valid,
        ids=data.ids,
        cells=cells,
    )


def main():
    from distropointclouds_tpu.core.config import TrainConfig
    from distropointclouds_tpu.train.data import load_scan_context_dir
    from distropointclouds_tpu.train.fit import fit

    val_id = _VAL
    assemble_dataset()
    augment_dataset(exclude=f"{val_id:06d}")
    if MIX_SYNTH:
        mix_synthetic(MIX_SYNTH)
    else:
        clear_mixed()
    data = load_scan_context_dir(DATA_DIR)
    print("samples:", len(data), "held-out test:", val_id)
    te_idx = np.asarray([data.ids.index(val_id)])
    tr_idx = np.asarray([i for i in range(len(data)) if i != te_idx[0]])
    # Selection set: the golden TRAIN scans (train-pooled F1). They sit
    # in tr_idx too — selection on training data is unbiased w.r.t. the
    # reported held-out scan.
    golden_train = [
        g for g in (840, 2073, 2095, 2160) if g != val_id
    ]
    val_idx = np.asarray([data.ids.index(g) for g in golden_train])

    if FAST:
        if TRAINER != "b":
            raise SystemExit("DPC_DET_FAST is trainer-B (TinyUNet) only")
        data = downsample_half(data)

    if TRAINER == "b":
        cfg = dataclasses.replace(
            TrainConfig.trainer_b(),
            epochs=EPOCHS,
            batch_size=16,
            heat_sigma=2.5,
            # Amplitude calibration (r2 VERDICT weak #4): fold 002160's
            # original run never crossed the reference eval threshold
            # 0.35 on its own TRAINING scans (runs/threshold_sweep.json:
            # 0 preds at 0.35/0.25). alpha up-weights the positive
            # heatmap cells; the reference's own trainer B uses 0.75 —
            # raise via DPC_DET_FOCAL_ALPHA when a fold under-shoots.
            focal_alpha=float(os.environ.get("DPC_DET_FOCAL_ALPHA", "0.75")),
            # The synth pool is <=340 MB: keep it in HBM, gather batches
            # on-device (epochs here are H2D-bound on the tunneled host).
            device_cache=True,
            ckpt_dir=CKPT_DIR,
        )
        if FAST:
            # Half-res grid: heat_sigma scales with the cell size so the
            # gaussian keeps its physical footprint.
            cfg = dataclasses.replace(
                cfg, height=80, width=360, heat_sigma=1.25
            )
    elif TRAINER == "a":
        cfg = dataclasses.replace(
            TrainConfig.trainer_a(),
            epochs=EPOCHS,
            batch_size=16,
            # Amplitude calibration, same story as trainers B/C below:
            # at the reference's pos_weight=2.0 the ~0.1%-positive masks
            # leave probabilities below 0.5 (the reference's OWN trained
            # tinycnn_best.pth maxes at sigmoid 0.059 — SURVEY §6). The
            # dice term helps but BCE dominates early; raise via
            # DPC_DET_POS_WEIGHT when a fold under-shoots.
            pos_weight=float(os.environ.get("DPC_DET_POS_WEIGHT", "2.0")),
            device_cache=True,
            ckpt_dir=CKPT_DIR,
        )
    else:
        cfg = dataclasses.replace(
            TrainConfig.trainer_c(),
            epochs=EPOCHS,
            batch_size=16,
            early_stop_patience=0,   # tiny val set; keep training
            # Calibration knob (r2 VERDICT weak #4): the reference's
            # alpha=0.25 under-weights the ~0.1%-positive masks so far
            # that probabilities stay below the banded thresholds even
            # on training scans (measured max prob 0.29 after 120
            # epochs). alpha=0.75 (trainer B's value) restores usable
            # amplitude; override via DPC_DET_FOCAL_ALPHA.
            focal_alpha=float(os.environ.get("DPC_DET_FOCAL_ALPHA", "0.75")),
            device_cache=True,
            ckpt_dir=CKPT_DIR,
        )
    state, final = fit(
        data,
        cfg,
        log_path=os.path.join(CKPT_DIR, "log.jsonl"),
        split=(tr_idx, val_idx, te_idx),
        eval_threshold=0.35,
        eval_every=EVAL_EVERY,
        track_test=True,
        # DPC_DET_RESUME=1 continues a fold interrupted by a tunnel
        # stall from its last checkpoint — safe because the synthetic
        # pool is seeded (default_rng(7)), so the rerun sees the
        # identical dataset.
        resume=os.environ.get("DPC_DET_RESUME") == "1",
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

    mgr = CheckpointManager(CKPT_DIR)
    best_meta = {}
    meta_path = os.path.join(CKPT_DIR, "best.meta.json")
    if os.path.exists(meta_path):
        best_meta = json.load(open(meta_path)).get("metrics", {})
    # The reference keeps the FIRST epoch when F1 never improves
    # (strict >); fall back to the last checkpoint for the demo then.
    tag = "best" if best_meta.get("f1", 0.0) > 0.0 else "last"
    print(f"demo checkpoint: {tag} (best f1={best_meta.get('f1')})")
    variables = mgr.restore_variables(tag)
    det_scale = 1.0
    if TRAINER == "b":
        if FAST:
            # Opt-in fast profile: packed 80x360 descriptor + this
            # half-res checkpoint; detections map to golden-grid
            # coordinates by x2 (cells align exactly).
            pipe_cfg = PipelineConfig.fast(
                normalize="clip",
                detector=DetectorConfig(peak_threshold=0.15),
            )
            det_scale = 2.0
        else:
            pipe_cfg = PipelineConfig(
                normalize="clip", detector=DetectorConfig(peak_threshold=0.15)
            )
        fn = jax.jit(build_pipeline("tiny_unet", pipe_cfg, postprocess="peaks"))
    elif TRAINER == "a":
        # trainer A: minmax normalization, sigmoid > mask_threshold 0.5,
        # connected components >= 20 px, centroid detections
        # (tiny_sc_ped.py:196-234). Component scores are AREAS, not
        # probabilities — detections are reported unthresholded (the
        # 0.5/20px gates already applied inside the pipeline).
        pipe_cfg = PipelineConfig(normalize="minmax")
        fn = jax.jit(build_pipeline("tiny_cnn", pipe_cfg,
                                    postprocess="components"))
    else:
        # trainer C: minmax normalization, ring-banded thresholds ->
        # connected components (tiny_sc_pred_v2.py:667-724 semantics)
        pipe_cfg = PipelineConfig(normalize="minmax")
        fn = jax.jit(build_pipeline("sc_unet", pipe_cfg, postprocess="banded"))
    results = {}
    for sid in fixtures.GOLDEN_IDS:
        role = "TEST" if int(sid) == val_id else "train"
        pb = PointBatch.from_numpy(
            fixtures.golden_scan(sid), pipe_cfg.scan_context.max_points
        )
        out = fn(variables, pb)
        det = out["detections"]
        gts = fixtures.golden_centers(sid)
        # The reference JSONs list every pedestrian twice (~1 cm apart,
        # SURVEY §2.3), which halves the attainable recall of a
        # one-to-one matcher. Report both the reference-faithful and
        # the deduplicated-GT metrics.
        gts_unique = sorted(set(gts))
        results[sid] = {"role": role}
        # trainer A's component scores are pixel areas (already gated at
        # mask 0.5 / 20 px); B and C report prob thresholds.
        thrs = (0.0,) if TRAINER == "a" else (0.35, 0.2)
        for thr in thrs:
            preds = [
                (float(r) * det_scale, float(s) * det_scale, float(v))
                for r, s, v, ok in zip(
                    np.asarray(det.ring), np.asarray(det.sector),
                    np.asarray(det.score), np.asarray(det.valid),
                )
                if ok and float(v) >= thr
            ]
            tp, fp, fn_ = M.match_centers(preds, gts)
            results[sid][f"thr{thr}"] = {
                "preds": len(preds), "tp": tp, "fp": fp, "fn": fn_,
                **M.precision_recall_f1(tp, fp, fn_),
            }
            tp, fp, fn_ = M.match_centers(preds, gts_unique)
            results[sid][f"thr{thr}_dedup"] = {
                "preds": len(preds), "tp": tp, "fp": fp, "fn": fn_,
                **M.precision_recall_f1(tp, fp, fn_),
            }
        print(f"detect {sid} [{role}]: {results[sid]}")

    with open(os.path.join(CKPT_DIR, "detect_results.json"), "w") as f:
        json.dump({"val_metrics": final, "detect": results}, f, indent=2)
    print("final:", final)


if __name__ == "__main__":
    main()
