"""Synthetic-scale generalization experiment (r3 VERDICT #3).

Every detector fold in runs/ trains on 3 golden scans plus synthetic
rolls of those same backgrounds — so held-out-fold F1 proves transfer
across *scans*, not across *scenes*. This experiment removes the golden
scans from training entirely:

1. Synthesize a KITTI-layout dataset of raw LiDAR scans
   (scripts/synth_kitti.py — point-cloud-level, seeded) and run the
   REAL production path (`cli build-dataset`) to produce descriptors +
   dual-source pedestrian labels.
2. Train trainer B (TinyUNet center heatmap, train_sc_ped.py semantics)
   on the synthetic descriptors ONLY, with an internal synthetic
   train/val split for checkpoint selection.
3. Evaluate the best checkpoint end-to-end (raw .bin -> descriptor ->
   TinyUNet -> peaks -> wrap-aware center matching,
   train_sc_ped.py:419-464 eval semantics) on the four golden KITTI
   scans — real data never seen in any form during training.

Nonzero held-out F1 here is the strongest available proof that the
training framework *learns* the descriptor-space pedestrian signature
rather than memorizing the four bundled scans.

Run on the TPU under timeout (CLAUDE.md stall discipline):
  timeout 5400 python scripts/train_synth_generalization.py
Knobs: DPC_SG_NUM (scans, default 300), DPC_SG_EPOCHS (default 240),
DPC_SG_REUSE=1 (reuse an already-built dataset dir).
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
if os.environ.get("JAX_PLATFORMS"):
    # Honor an explicit platform request despite the sitecustomize hook
    # (CLAUDE.md) — lets the miniature smoke test run on CPU.
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

NUM = int(os.environ.get("DPC_SG_NUM", "300"))
EPOCHS = int(os.environ.get("DPC_SG_EPOCHS", "240"))
EVAL_EVERY = int(os.environ.get("DPC_SG_EVAL_EVERY", "10"))
# DPC_SG_REALISM=v1 (run 1's point-soup provenance) | v2 (single-return
# depth-map synthesis: occlusion, facades, foliage) | v3 (v2 plus the
# measured-FP distractor classes — scripts/synth_kitti.py).
# Separate dataset + checkpoint dirs keep every run's artifacts intact.
REALISM = os.environ.get("DPC_SG_REALISM", "v1")
_SFX = "" if REALISM == "v1" else f"_{REALISM}"
KITTI = os.path.join(REPO, "runs", f"synthgen_kitti{_SFX}")
CKPT_DIR = os.path.join(REPO, "runs", f"detector_ckpt_synthgen{_SFX}")


def build_synthetic_dataset() -> str:
    """Synthesize raw scans and run the production label factory.

    build-dataset runs on CPU: per-scan dispatch over the TPU tunnel
    pays ~30 ms RTT each (CLAUDE.md); the host sort_route path is the
    right tool for a batch job and exercises the same descriptor code.
    """
    sc_dir = os.path.join(KITTI, "training", "scan_context")
    if os.environ.get("DPC_SG_REUSE") == "1" and os.path.isdir(sc_dir):
        print(f"reusing dataset in {sc_dir}")
        return sc_dir
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # pure-host steps; never touch the tunnel
    subprocess.run(
        [sys.executable, "scripts/synth_kitti.py", "--num", str(NUM),
         "--out", KITTI, "--seed", "20260818", "--realism", REALISM],
        check=True, cwd=REPO, env=env, timeout=2400,
    )
    subprocess.run(
        [sys.executable, "-m", "distropointclouds_tpu.cli.main",
         "build-dataset", "--kitti_root", KITTI, "--mode", "train"],
        check=True, cwd=REPO, env=env, timeout=2400,
    )
    return sc_dir


def main():
    from distropointclouds_tpu.core.config import TrainConfig
    from distropointclouds_tpu.train.data import load_scan_context_dir
    from distropointclouds_tpu.train.fit import fit

    t0 = time.time()
    sc_dir = build_synthetic_dataset()
    data = load_scan_context_dir(sc_dir)
    print(f"synthetic samples: {len(data)} (golden scans: 0 — fully held out)")

    # Internal synthetic split for checkpoint selection; the GOLDEN
    # scans are the test set and appear nowhere here.
    rng = np.random.default_rng(1337)
    perm = rng.permutation(len(data))
    n_val = max(1, int(0.1 * len(data)))
    val_idx, tr_idx = np.sort(perm[:n_val]), np.sort(perm[n_val:])

    cfg = dataclasses.replace(
        TrainConfig.trainer_b(),
        epochs=EPOCHS,
        batch_size=16,
        heat_sigma=2.5,  # same amplitude calibration as the fold runs
        device_cache=True,
        ckpt_dir=CKPT_DIR,
    )
    state, final = fit(
        data,
        cfg,
        log_path=os.path.join(CKPT_DIR, "log.jsonl"),
        split=(tr_idx, val_idx, np.asarray([], np.int64)),
        eval_threshold=0.35,
        eval_every=EVAL_EVERY,
        resume=os.environ.get("DPC_SG_RESUME") == "1",
    )
    train_s = time.time() - t0
    # `final` is fit()'s TEST-split metrics and the test split here is
    # empty by design (the goldens are the test set, evaluated below);
    # the synthetic-val metrics live in best.meta.json.
    print(f"train wall: {train_s:.0f}s")

    # --- Golden-scan test: end-to-end pipeline on real KITTI scans the
    # model has never seen in any form.
    import jax.numpy as jnp  # noqa: F401  (device warmup path)

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
    tag = "best" if best_meta.get("f1", 0.0) > 0.0 else "last"
    print(f"test checkpoint: {tag} (synthetic-val best f1={best_meta.get('f1')})")
    variables = mgr.restore_variables(tag)

    pipe_cfg = PipelineConfig(
        normalize="clip", detector=DetectorConfig(peak_threshold=0.15)
    )
    fn = jax.jit(build_pipeline("tiny_unet", pipe_cfg, postprocess="peaks"))
    results = {}
    agg = {}
    for sid in fixtures.GOLDEN_IDS:
        pb = PointBatch.from_numpy(
            fixtures.golden_scan(sid), pipe_cfg.scan_context.max_points
        )
        out = fn(variables, pb)
        det = out["detections"]
        gts = fixtures.golden_centers(sid)
        gts_unique = sorted(set(gts))
        results[sid] = {"role": "TEST (never seen)"}
        for thr in (0.35, 0.2):
            preds = [
                (float(r), float(s), float(v))
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
            a = agg.setdefault(f"thr{thr}_dedup", {"tp": 0, "fp": 0, "fn": 0})
            a["tp"] += tp
            a["fp"] += fp
            a["fn"] += fn_
        print(f"test {sid}: {results[sid]}")

    for k, a in agg.items():
        a.update(M.precision_recall_f1(a["tp"], a["fp"], a["fn"]))
    summary = {
        "num_synth_scans": len(data),
        "epochs": EPOCHS,
        "train_wall_s": round(train_s, 1),
        "synthetic_val_best": best_meta,  # checkpoint-selection metrics
        "golden_test_aggregate": agg,
        "detect": results,
    }
    with open(os.path.join(CKPT_DIR, "detect_results.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("aggregate (dedup GT):", json.dumps(agg))


if __name__ == "__main__":
    main()
