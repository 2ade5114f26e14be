"""Scan-context-space ground truth: covered-cells masks & center indices.

Reimplements the reference's label math (`kitti_dataset.py:129-253`):
- ``center_indices``: pedestrian (x, y) -> (ring, sector) center cell
  (kitti_dataset.py:129-159; note the comments there claim 80 m / 0.5 m
  rings but the value is 20 m / 0.125 m — quirk register #4).
- ``covered_cells_mask``: boolean (R, S) mask of cells whose *centers*
  lie inside the rotated pedestrian footprint (kitti_dataset.py:204-253)
  — already a natural dense broadcast, so the TPU version is a single
  vectorized test over the whole cell grid, batched over pedestrians
  with ``vmap``.
- ``covered_cells_list``: the (K, 2) row-major [ring, sector] rows the
  reference serializes to ``pedestrians_*.json`` (host-side, ragged).

Survey §2.3 verified the mask formula reproduces all 16/16
``covered_cells`` lists in ``pedestrians_002160.json`` exactly; the
parity test re-checks that here.
"""

from __future__ import annotations

from functools import lru_cache as _lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..core.config import ScanContextConfig
from ..ops.invert import cell_center_grid


def center_indices(
    x: jnp.ndarray, y: jnp.ndarray, cfg: ScanContextConfig = ScanContextConfig()
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ring, sector) int32 center cell for LiDAR (x, y), vectorized.

    kitti_dataset.py:151-157: ``ring = int(min(r / gap_ring, R - 1))``
    (plain truncation, not floor-div) and ``sector = int(theta / gap)``.
    """
    theta = jnp.rad2deg(jnp.arctan2(y, x)) % 360.0
    r = jnp.sqrt(x * x + y * y)
    ring = jnp.minimum(r / cfg.gap_ring, cfg.num_ring - 1).astype(jnp.int32)
    sector = (theta / cfg.gap_sector).astype(jnp.int32)
    sector = jnp.clip(sector, 0, cfg.num_sector - 1)
    return ring, sector


def covered_cells_mask(
    x: jnp.ndarray,
    y: jnp.ndarray,
    l: jnp.ndarray,
    w: jnp.ndarray,
    yaw: jnp.ndarray,
    cfg: ScanContextConfig = ScanContextConfig(),
) -> jnp.ndarray:
    """(R, S) bool mask of cells covered by one rotated footprint.

    kitti_dataset.py:222-249: translate cell centers by the box center,
    rotate into the box frame by R(-yaw) = [[c, s], [-s, c]], keep
    |X_local| <= l/2 and |Y_local| <= w/2. Scalars broadcast; extra
    leading dims on the inputs produce batched masks.
    """
    Xc, Yc = cell_center_grid(cfg)  # (R, S)
    X = Xc - jnp.asarray(x)[..., None, None]
    Y = Yc - jnp.asarray(y)[..., None, None]
    c = jnp.cos(yaw)[..., None, None]
    s = jnp.sin(yaw)[..., None, None]
    Xl = c * X + s * Y
    Yl = -s * X + c * Y
    return (jnp.abs(Xl) <= jnp.asarray(l)[..., None, None] * 0.5) & (
        jnp.abs(Yl) <= jnp.asarray(w)[..., None, None] * 0.5
    )


def combined_mask(
    boxes_xylwyaw: jnp.ndarray, cfg: ScanContextConfig = ScanContextConfig()
) -> jnp.ndarray:
    """OR of per-pedestrian masks, the training target of
    `tiny_sc_ped.py:62-73` / `tiny_sc_pred_v2.py:82-85`.

    Args:
      boxes_xylwyaw: (P, 5) rows [x, y, l, w, yaw]; invalid rows can be
        padded with zeros (zero-size boxes cover nothing... unless a cell
        center coincides exactly, so pad with l = w = -1 to be safe).
    """
    masks = covered_cells_mask(
        boxes_xylwyaw[:, 0],
        boxes_xylwyaw[:, 1],
        boxes_xylwyaw[:, 2],
        boxes_xylwyaw[:, 3],
        boxes_xylwyaw[:, 4],
        cfg,
    )
    return jnp.any(masks, axis=0)


def covered_cells_list(
    x: float,
    y: float,
    l: float,
    w: float,
    yaw: float,
    cfg: ScanContextConfig = ScanContextConfig(),
) -> np.ndarray:
    """(K, 2) [ring, sector] rows in row-major scan order — the exact
    JSON serialization of `kitti_dataset.py:251-253`. Host-side (ragged
    output); uses float64 like the reference."""
    mask = np.asarray(covered_cells_mask_np(x, y, l, w, yaw, cfg))
    rr, ss = np.nonzero(mask)
    return np.stack([rr, ss], axis=1)


@_lru_cache(maxsize=8)
def _host_cell_grid(
    num_ring: int, num_sector: int, max_length: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Float64 Cartesian cell-center grids (R*cos(TH), R*sin(TH)) —
    pedestrian-independent, so computed once per grid geometry (the
    trig over all R*S cells dominated the per-pedestrian cost)."""
    gap_ring = max_length / num_ring
    gap_sector = 360.0 / num_sector
    r_centers = (np.arange(num_ring) + 0.5) * gap_ring
    t_centers = np.deg2rad((np.arange(num_sector) + 0.5) * gap_sector)
    R, TH = np.meshgrid(r_centers, t_centers, indexing="ij")
    return R * np.cos(TH), R * np.sin(TH)


def covered_cells_mask_np(
    x: float,
    y: float,
    l: float,
    w: float,
    yaw: float,
    cfg: ScanContextConfig = ScanContextConfig(),
) -> np.ndarray:
    """Float64 numpy twin of :func:`covered_cells_mask` for the host-side
    label factory (bit-parity with the reference's JSON output).

    Exactness-preserving restriction: a covered cell center is within
    half the box diagonal of the box center, so only rings whose center
    radius falls in that band (widened by one full ring of fp margin)
    can contain covered cells. The predicate is evaluated with the
    identical float64 sequence for every candidate cell, so the output
    equals the reference's full-grid test (kitti_dataset.py:204-253)
    bit for bit — parity-gated in tests/test_labels.py."""
    GX, GY = _host_cell_grid(cfg.num_ring, cfg.num_sector, cfg.max_length)
    mask = np.zeros(GX.shape, bool)
    halfdiag = 0.5 * float(np.hypot(l, w))
    r_ped = float(np.hypot(x, y))
    lo = max(0, int(np.floor((r_ped - halfdiag) / cfg.gap_ring)) - 1)
    hi = min(
        cfg.num_ring, int(np.ceil((r_ped + halfdiag) / cfg.gap_ring)) + 2
    )
    if lo >= hi:
        return mask
    X = GX[lo:hi] - x
    Y = GY[lo:hi] - y
    c, s = np.cos(yaw), np.sin(yaw)
    Xl = c * X + s * Y
    Yl = -s * X + c * Y
    mask[lo:hi] = (np.abs(Xl) <= 0.5 * l) & (np.abs(Yl) <= 0.5 * w)
    return mask


def mask_from_cell_rows(
    cells: np.ndarray, cfg: ScanContextConfig = ScanContextConfig(), wrap: bool = False
) -> np.ndarray:
    """(K, 2) [ring, sector] rows -> (R, S) uint8 mask.

    ``wrap=False`` drops out-of-range rows (tiny_sc_ped.py:69-72);
    ``wrap=True`` clips rings and wraps sectors mod S
    (train_sc_ped.py:180-184).
    """
    m = np.zeros(cfg.grid_shape, np.uint8)
    cells = np.asarray(cells, dtype=np.int64).reshape(-1, 2)
    if cells.size == 0:
        return m
    if wrap:
        rr = np.clip(cells[:, 0], 0, cfg.num_ring - 1)
        ss = np.mod(cells[:, 1], cfg.num_sector)
        m[rr, ss] = 1
    else:
        ok = (
            (cells[:, 0] >= 0)
            & (cells[:, 0] < cfg.num_ring)
            & (cells[:, 1] >= 0)
            & (cells[:, 1] < cfg.num_sector)
        )
        m[cells[ok, 0], cells[ok, 1]] = 1
    return m
