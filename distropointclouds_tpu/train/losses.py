"""Loss functions of the three reference trainers, as pure jnp.

- ``bce_with_logits`` (+ pos_weight): trainer A's criterion
  (`tiny_sc_ped.py:161` BCEWithLogitsLoss(pos_weight=2.0)).
- ``dice_loss``: trainers A/B (`tiny_sc_ped.py:75-80`,
  `train_sc_ped.py:101-105`).
- ``bce_focal_loss``: trainer B (`train_sc_ped.py:86-99`,
  alpha=0.75, gamma=2.0).
- ``adaptive_focal_loss``: trainer C (`tiny_sc_pred_v2.py:239-261`,
  gamma=2.0, base_alpha=0.25, per-pixel weights scale alpha).
- ``iou_from_logits``: trainer A's eval metric (`tiny_sc_ped.py:82-86`).

All operate on logits/targets shaped [..., H, W] (channel squeezed) and
reduce exactly like the torch originals.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _batch_mean(
    elementwise: jnp.ndarray, sample_weight: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Mean over everything, or — with per-sample weights [B] — the
    weighted mean of per-sample means. With all-ones weights the two are
    identical (every sample has the same pixel count); zero weights mask
    padded duplicate samples out of the loss (torch DataLoader
    drop_last=False exact-mean semantics)."""
    if sample_weight is None:
        return elementwise.mean()
    per_sample = elementwise.mean(axis=tuple(range(1, elementwise.ndim)))
    w = sample_weight.astype(per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_weight: Optional[float] = None,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean BCE-with-logits; ``pos_weight`` multiplies the positive term
    like torch's BCEWithLogitsLoss(pos_weight=...)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    pw = 1.0 if pos_weight is None else pos_weight
    loss = -(pw * targets * log_p + (1.0 - targets) * log_not_p)
    return _batch_mean(loss, sample_weight)


def bce_elementwise(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return -(
        targets * jax.nn.log_sigmoid(logits)
        + (1.0 - targets) * jax.nn.log_sigmoid(-logits)
    )


def dice_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    eps: float = 1e-6,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """1 - mean dice over the batch. Reduction axes are all but the
    leading batch axis (matching the [B,1,H,W] sums of the reference).

    Note the numerator-eps asymmetry between the two reference copies:
    tiny_sc_ped.py:75-80 adds eps to the numerator, train_sc_ped.py
    doesn't; we follow trainer A (the difference is ~1e-6).
    """
    probs = jax.nn.sigmoid(logits)
    axes = tuple(range(1, logits.ndim))
    num = 2.0 * jnp.sum(probs * targets, axis=axes) + eps
    den = jnp.sum(probs, axis=axes) + jnp.sum(targets, axis=axes) + eps
    dice = num / den
    if sample_weight is None:
        return 1.0 - jnp.mean(dice)
    w = sample_weight.astype(dice.dtype)
    return 1.0 - jnp.sum(dice * w) / jnp.maximum(jnp.sum(w), 1.0)


def bce_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.75,
    gamma: float = 2.0,
    reduction: str = "mean",
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Focal-modulated BCE (train_sc_ped.py:86-99)."""
    bce = bce_elementwise(logits, targets)
    p = jax.nn.sigmoid(logits)
    pt = targets * p + (1.0 - targets) * (1.0 - p)
    focal = alpha * (1.0 - pt) ** gamma * bce
    if reduction == "mean":
        return _batch_mean(focal, sample_weight)
    if reduction == "sum":
        return focal.sum()
    return focal


def adaptive_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pixel_weights: Optional[jnp.ndarray] = None,
    gamma: float = 2.0,
    base_alpha: float = 0.25,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Trainer C's AdaptiveFocalLoss (tiny_sc_pred_v2.py:239-261):
    alpha is scaled per-pixel by the adaptive weight map on positives,
    (1 - base_alpha) on negatives."""
    ce = bce_elementwise(logits, targets)
    p = jax.nn.sigmoid(logits)
    pt = targets * p + (1.0 - targets) * (1.0 - p)
    focal_w = (1.0 - pt) ** gamma
    alpha = base_alpha if pixel_weights is None else base_alpha * pixel_weights
    alpha_t = alpha * targets + (1.0 - base_alpha) * (1.0 - targets)
    return _batch_mean(ce * focal_w * alpha_t, sample_weight)


def iou_from_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    thr: float = 0.5,
    eps: float = 1e-6,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean pixel IoU at a threshold (tiny_sc_ped.py:82-86)."""
    preds = (jax.nn.sigmoid(logits) > thr).astype(jnp.float32)
    axes = tuple(range(1, logits.ndim))
    inter = jnp.sum(preds * targets, axis=axes)
    union = jnp.sum(((preds + targets) >= 1).astype(jnp.float32), axis=axes)
    iou = (inter + eps) / (union + eps)
    if sample_weight is None:
        return jnp.mean(iou)
    w = sample_weight.astype(iou.dtype)
    return jnp.sum(iou * w) / jnp.maximum(jnp.sum(w), 1.0)
