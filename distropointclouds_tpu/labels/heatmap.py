"""Training-target construction in descriptor space.

- Gaussian center heatmaps (max-composited), the target of trainer B
  (`train_sc_ped.py:74-79,166-173`).
- Adaptive pixel weight maps, the size/distance weighting of trainer C
  (`tiny_sc_pred_v2.py:58-85`).

All dense, vectorized, jittable; pedestrians are passed as fixed-size
padded arrays with a validity mask so target building can live inside
the jitted input pipeline.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import ScanContextConfig


def gaussian2d(
    shape: Tuple[int, int], center_r: jnp.ndarray, center_s: jnp.ndarray, sigma: float
) -> jnp.ndarray:
    """exp(-0.5 * d^2 / sigma^2) around (center_r, center_s)
    (train_sc_ped.py:74-79). Centers may carry leading batch dims.

    Note: like the reference, distance is computed WITHOUT sector
    wrap-around — a pedestrian at sector 0 does not bleed into 719.
    """
    R, S = shape
    rr = jnp.arange(R, dtype=jnp.float32)[:, None]
    ss = jnp.arange(S, dtype=jnp.float32)[None, :]
    cr = jnp.asarray(center_r, jnp.float32)[..., None, None]
    cs = jnp.asarray(center_s, jnp.float32)[..., None, None]
    d2 = (rr - cr) ** 2 + (ss - cs) ** 2
    return jnp.exp(-0.5 * d2 / (sigma**2))


def center_heatmap(
    centers: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: ScanContextConfig = ScanContextConfig(),
    sigma: float = 1.8,
) -> jnp.ndarray:
    """Max-composite Gaussian heatmap over valid pedestrians
    (train_sc_ped.py:166-173).

    Args:
      centers: (P, 2) float [ring, sector] center indices (padded).
      valid: (P,) bool.

    Returns: (R, S) float32 heatmap in [0, 1].
    """
    gs = gaussian2d(cfg.grid_shape, centers[:, 0], centers[:, 1], sigma)  # (P, R, S)
    gs = jnp.where(valid[:, None, None], gs, 0.0)
    return jnp.max(gs, axis=0, initial=0.0)


def adaptive_weight_map(
    masks: jnp.ndarray,
    num_cells: jnp.ndarray,
    distance: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Per-pixel loss weights from pedestrian size & distance
    (tiny_sc_pred_v2.py:60-85):

      size_weight = min(100 / num_cells, 5)
      distance_weight = 1 + (distance / 20)^2
      ped_weight = min(size * distance, 10)       (1.0 if no cells)
      weight_map[cell] = max over covering pedestrians (floor 1.0)

    Args:
      masks: (P, R, S) bool per-pedestrian covered-cells masks.
      num_cells: (P,) int — covered-cell count per pedestrian.
      distance: (P,) float.
      valid: (P,) bool.
    """
    nc = jnp.maximum(num_cells.astype(jnp.float32), 1.0)
    size_w = jnp.minimum(100.0 / nc, 5.0)
    dist_w = 1.0 + (distance.astype(jnp.float32) / 20.0) ** 2
    ped_w = jnp.minimum(size_w * dist_w, 10.0)
    ped_w = jnp.where(num_cells > 0, ped_w, 1.0)
    ped_w = jnp.where(valid, ped_w, 0.0)
    per_ped = masks.astype(jnp.float32) * ped_w[:, None, None]
    return jnp.maximum(jnp.max(per_ped, axis=0, initial=0.0), 1.0)


def mask_dropout(
    mask: jnp.ndarray, key: jax.Array, p: float
) -> jnp.ndarray:
    """Randomly drop positive pixels (tiny_sc_ped.py:96-101)."""
    if p <= 0.0:
        return mask
    drop = jax.random.uniform(key, mask.shape) < p
    return jnp.clip(mask - mask * drop.astype(mask.dtype), 0.0, 1.0)


def roll_sectors(*arrays: jnp.ndarray, shift: jnp.ndarray) -> tuple:
    """Cyclic roll along the sector (last) axis — the reference's main
    augmentation (tiny_sc_ped.py:88-94, train_sc_ped.py:189-194). Uses
    ``jnp.roll`` with a traced shift so it stays jittable."""
    return tuple(jnp.roll(a, shift, axis=-1) for a in arrays)
