"""Evaluation metrics: all three reference metric families (SURVEY §5).

- Pixel IoU (trainer A, `tiny_sc_ped.py:82-86`) — in losses.py.
- Greedy wrap-aware center matching P/R/F1 (trainer B,
  `train_sc_ped.py:312-340,461-464`): predictions in given order grab
  the nearest unused GT within (dr <= 3, ds <= 6 with circular sector
  wrap), prioritized by smallest (dr, ds).
- Pixel-level P/R/F1/IoU overall and per ring band (trainer C,
  `tiny_sc_pred_v2.py:303-410`): bands 0-60 / 60-120 / 120-160 rings
  (= 0-7.5 / 7.5-15 / 15-20 m at max_length 20).

The greedy matcher is host-side numpy (it is an eval-time metric over
<= topk detections; the reference's is a Python double loop); the pixel
metrics are jittable.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def wrap_sector_distance(a, b, num_sector: int = 720):
    """Minimal circular distance on the sector axis
    (train_sc_ped.py:81-84)."""
    diff = np.abs(np.asarray(a) - np.asarray(b))
    return np.minimum(diff, num_sector - diff)


def match_centers(
    preds: Sequence[Tuple[int, int, float]],
    gts: Sequence[Tuple[int, int]],
    max_r_dist: int = 3,
    max_s_dist: int = 6,
    num_sector: int = 720,
) -> Tuple[int, int, int]:
    """Greedy matching with sector wrap (train_sc_ped.py:312-340).

    Returns (tp, fp, fn). Predictions are consumed in the given order
    (callers pass them score-descending, as extract_peaks returns them);
    each grabs the unused GT minimizing (dr, ds) lexicographically.
    """
    used: set = set()
    tp = 0
    for r, s, _score in preds:
        best, best_d = -1, (np.inf, np.inf)
        for i, (gr, gs) in enumerate(gts):
            if i in used:
                continue
            dr = abs(int(r) - int(gr))
            ds = int(wrap_sector_distance(int(s), int(gs), num_sector))
            if dr <= max_r_dist and ds <= max_s_dist and (dr, ds) < best_d:
                best_d = (dr, ds)
                best = i
        if best >= 0:
            tp += 1
            used.add(best)
    return tp, len(preds) - tp, len(gts) - tp


def precision_recall_f1(tp: int, fp: int, fn: int) -> Dict[str, float]:
    """P/R/F1 with the reference's epsilon guards
    (train_sc_ped.py:461-464)."""
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    return {"precision": precision, "recall": recall, "f1": f1}


def pixel_metrics(
    probs: jnp.ndarray,
    target: jnp.ndarray,
    threshold: float = 0.5,
    eps: float = 1e-6,
) -> Dict[str, jnp.ndarray]:
    """Pixel-level P/R/F1/IoU (tiny_sc_pred_v2.py:376-410), jittable.
    probs/target: [..., H, W]."""
    pred = (probs > threshold).astype(jnp.float32)
    tgt = target.astype(jnp.float32)
    tp = jnp.sum(pred * tgt)
    fp = jnp.sum(pred * (1 - tgt))
    fn = jnp.sum((1 - pred) * tgt)
    precision = tp / (tp + fp + eps)
    recall = tp / (tp + fn + eps)
    f1 = 2 * precision * recall / (precision + recall + eps)
    iou = tp / (tp + fp + fn + eps)
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "iou": iou,
        "tp": tp,
        "fp": fp,
        "fn": fn,
    }


RING_BANDS = ((0, 60), (60, 120), (120, 160))  # tiny_sc_pred_v2.py:316-321


def range_stratified_metrics(
    probs: jnp.ndarray,
    target: jnp.ndarray,
    band_thresholds: Sequence[float] = (0.5, 0.4, 0.3),
    bands: Sequence[Tuple[int, int]] = RING_BANDS,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Per-ring-band pixel metrics with the band's own threshold
    (tiny_sc_pred_v2.py:303-410: near 0.5 / med 0.4 / far 0.3 over
    rings 0-60 / 60-120 / 120-160). probs/target: [..., H, W]."""
    out = {}
    for (lo, hi), thr in zip(bands, band_thresholds):
        out[f"rings_{lo}_{hi}"] = pixel_metrics(
            probs[..., lo:hi, :], target[..., lo:hi, :], thr
        )
    return out


def evaluate_centers_against_json(
    detections,
    peds: Sequence[dict],
    max_r_dist: int = 3,
    max_s_dist: int = 6,
    num_sector: int = 720,
) -> Dict[str, float]:
    """Center-matching metrics for one scan against pedestrians_*.json
    records (the eval path of train_sc_ped.py:441-464; note the
    reference double-counts duplicated GT entries — pass a deduped list
    to change that consciously)."""
    preds = [
        (float(r), float(s), float(v))
        for r, s, v, ok in zip(
            np.asarray(detections.ring),
            np.asarray(detections.sector),
            np.asarray(detections.score),
            np.asarray(detections.valid),
        )
        if ok
    ]
    gts = [
        (int(p["center_ring_idx"]), int(p["center_sector_idx"])) for p in peds
    ]
    tp, fp, fn = match_centers(preds, gts, max_r_dist, max_s_dist, num_sector)
    out = precision_recall_f1(tp, fp, fn)
    out.update(tp=tp, fp=fp, fn=fn)
    return out
