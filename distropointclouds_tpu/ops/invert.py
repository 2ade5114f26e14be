"""Descriptor inversion: scan-context grid -> sparse point cloud.

TPU-native reimplementation of `reconstruct_pointcloud.py:47-77`
(``scan_context_to_pointcloud``): every non-empty cell emits one point at
its cell-center polar coordinate with z equal to the stored max height.
The reference returns ragged arrays; here the output is fixed-shape
[R*S, 3] plus a validity mask (XLA needs static shapes), with the same
row-major (ring-major) cell order and the same linear ``bin_ids``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import ScanContextConfig


def cell_center_grid(cfg: ScanContextConfig) -> Tuple[jax.Array, jax.Array]:
    """(R, S) cartesian X, Y coordinates of every cell center.

    Cell centers are at ``(ring + 0.5) * gap_ring`` radially and
    ``(sector + 0.5) * gap_sector`` degrees angularly
    (reconstruct_pointcloud.py:49-59, kitti_dataset.py:226-233).
    """
    r = (jnp.arange(cfg.num_ring, dtype=jnp.float32)[:, None] + 0.5) * jnp.float32(
        cfg.gap_ring
    )
    theta = jnp.deg2rad(
        (jnp.arange(cfg.num_sector, dtype=jnp.float32)[None, :] + 0.5)
        * jnp.float32(cfg.gap_sector)
    )
    return r * jnp.cos(theta), r * jnp.sin(theta)


def scan_context_to_pointcloud(
    grid: jax.Array,
    cfg: ScanContextConfig = ScanContextConfig(),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Invert a descriptor grid into a fixed-shape point set.

    Args:
      grid: [..., R, S] descriptor.
      cfg: matching generation parameters (reconstruct_pointcloud.py:42-45
        insists these must match the generator).

    Returns:
      points:  [..., R*S, 3] float32 — cell-center x, y and height z
               (height offset removed in offset mode, matching
               reconstruct_pointcloud.py:62-66).
      valid:   [..., R*S] bool — cell emitted a point (``z != 0`` in
               full-height mode, ``z > 0`` in offset mode).
      bin_ids: [R*S] int32 — linear cell id ``ring * S + sector`` per row
               (reconstruct_pointcloud.py:72-75); constant, unbatched.
    """
    X, Y = cell_center_grid(cfg)
    Z = grid
    if cfg.use_full_height_range:
        valid = Z != 0
    else:
        valid = Z > 0
        Z = jnp.where(valid, Z - jnp.float32(cfg.height_offset), Z)

    batch = grid.shape[:-2]
    n = cfg.num_ring * cfg.num_sector
    X = jnp.broadcast_to(X, grid.shape).reshape(batch + (n,))
    Y = jnp.broadcast_to(Y, grid.shape).reshape(batch + (n,))
    Z = Z.reshape(batch + (n,))
    points = jnp.stack([X, Y, Z], axis=-1)
    bin_ids = jnp.arange(n, dtype=jnp.int32)
    return points, valid.reshape(batch + (n,)), bin_ids


def covered_cell_points(
    grid: jax.Array,
    covered_cells: jax.Array,
    cfg: ScanContextConfig = ScanContextConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """Cell-center points for a list of (ring, sector) covered cells,
    mirroring `reconstruct_pointcloud.py:104-130`
    (``add_covered_cells_to_pointcloud``): indices are clipped into
    range and z is looked up from the grid.

    Args:
      grid: [R, S] descriptor.
      covered_cells: [K, 2] int32 (ring, sector) rows.

    Returns:
      points: [K, 3]; valid: [K] bool (offset mode filters z > 0).
    """
    rr = jnp.clip(covered_cells[:, 0], 0, cfg.num_ring - 1)
    ss = jnp.clip(covered_cells[:, 1], 0, cfg.num_sector - 1)
    r = (rr.astype(jnp.float32) + 0.5) * jnp.float32(cfg.gap_ring)
    theta = jnp.deg2rad((ss.astype(jnp.float32) + 0.5) * jnp.float32(cfg.gap_sector))
    z = grid[rr, ss]
    valid = jnp.ones_like(z, dtype=bool)
    if not cfg.use_full_height_range:
        valid = z > 0
        z = jnp.where(valid, z - jnp.float32(cfg.height_offset), z)
    points = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), z], axis=-1)
    return points, valid
