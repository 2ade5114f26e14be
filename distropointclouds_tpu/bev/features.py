"""BEV rasterization: the legacy Complex-YOLO 608x608 RGB-map, TPU-native.

`kitti_bev_utils.py:18-76` builds three channels by triple-lexsort +
``np.unique`` on a (609, 609) grid:
  height    = z (shifted by -minZ) of the top point per cell / 4.0
  intensity = intensity of that same top point
  density   = min(1, log(count + 1) / log(64)) per cell

The TPU version reuses the descriptor kernel's scatter-free recipe: one
lexicographic sort by (cell, z) with the intensity carried alongside
puts each cell's top point at its run end; a segmented count scan gives
density; a stable partition compacts run ends into the dense grid. All
fixed-shape, vmappable.

Output layout is NHWC [H, W, 3] with channels
(intensity, height, density) == the reference's RGB_Map channels
(0, 1, 2) (kitti_bev_utils.py:71-74 maps density->ch2, height->ch1,
intensity->ch0 of its CHW array).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.types import PointBatch
from .config import BevConfig, Boundary


def crop_points(
    xyzi: jnp.ndarray, valid: jnp.ndarray, b: Boundary
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Boundary crop + z shift (`removePoints`, kitti_bev_utils.py:18-34),
    mask-based instead of compacting (static shapes)."""
    x, y, z = xyzi[..., 0], xyzi[..., 1], xyzi[..., 2]
    keep = (
        valid
        & (x >= b.min_x)
        & (x <= b.max_x)
        & (y >= b.min_y)
        & (y <= b.max_y)
        & (z >= b.min_z)
        & (z <= b.max_z)
    )
    shifted = xyzi.at[..., 2].add(-b.min_z) if hasattr(xyzi, "at") else xyzi
    return shifted, keep


def make_bev_feature(
    points: PointBatch | jnp.ndarray,
    cfg: BevConfig = BevConfig(),
) -> jnp.ndarray:
    """[H, W, 3] (or batched) BEV map (makeBVFeature,
    kitti_bev_utils.py:37-76)."""
    if isinstance(points, PointBatch):
        xyzi = points.xyzi
        valid = points.valid_mask()
    else:
        xyzi = jnp.asarray(points)
        valid = jnp.ones(xyzi.shape[:-1], dtype=bool)
    if xyzi.ndim == 3:
        return jax.vmap(lambda p, v: _bev_single(p, v, cfg))(xyzi, valid)
    return _bev_single(xyzi, valid, cfg)


def _bev_single(xyzi: jnp.ndarray, valid: jnp.ndarray, cfg: BevConfig) -> jnp.ndarray:
    b = cfg.boundary
    xyzi, keep = crop_points(xyzi, valid, b)
    H1, W1 = cfg.height + 1, cfg.width + 1  # the reference's +1 grid
    disc = cfg.discretization

    x = xyzi[:, 0]
    y = xyzi[:, 1]
    z = xyzi[:, 2]
    inten = xyzi[:, 3]

    # Reference indexing (kitti_bev_utils.py:43-44): int(floor(x/d)) and
    # int(floor(y/d) + W1/2); the truncation after +304.5 keeps floor's
    # value for the non-negative range produced by the crop.
    xi = jnp.floor(x / disc)
    yi = jnp.floor(y / disc) + W1 / 2.0
    xi = jnp.trunc(xi).astype(jnp.int32)
    yi = jnp.trunc(yi).astype(jnp.int32)
    xi = jnp.clip(xi, 0, H1 - 1)
    yi = jnp.clip(yi, 0, W1 - 1)

    num_cells = H1 * W1
    cell = jnp.where(keep, xi * W1 + yi, num_cells)
    zk = jnp.where(keep, z, -jnp.inf)
    n = cell.shape[0]

    # Markers guarantee one run per cell; empty cells read 0.
    marker_cells = jnp.arange(num_cells, dtype=jnp.int32)
    neg = jnp.float32(-jnp.inf)
    all_cells = jnp.concatenate([cell, marker_cells])
    all_z = jnp.concatenate([zk, jnp.full((num_cells,), neg)])
    # Tertiary key: negated original index, so among equal-z points the
    # run end is the FIRST in scan order — matching the reference's
    # stable lexsort + unique-first tie-break (kitti_bev_utils.py:47-54).
    all_negidx = jnp.concatenate(
        [-jnp.arange(n, dtype=jnp.int32), jnp.full((num_cells,), jnp.int32(1))]
    )
    all_i = jnp.concatenate([inten, jnp.zeros((num_cells,))])
    all_count = jnp.concatenate(
        [keep.astype(jnp.float32), jnp.zeros((num_cells,))]
    )

    s_cell, s_z, _, s_i, s_c = jax.lax.sort(
        (all_cells, all_z, all_negidx, all_i, all_count), num_keys=3
    )

    # Segmented count scan (for density).
    def comb(a, bb):
        ka, ca = a
        kb, cb = bb
        return kb, jnp.where(ka == kb, ca + cb, cb)

    _, counts = jax.lax.associative_scan(comb, (s_cell, s_c))

    nxt = jnp.concatenate([s_cell[1:], jnp.full((1,), jnp.int32(-1))])
    run_end = s_cell != nxt
    ne = jnp.logical_not(run_end).astype(jnp.int32)
    _, g_z, g_i, g_cnt = jax.lax.sort((ne, s_z, s_i, counts), num_keys=1,
                                      is_stable=True)
    g_z = g_z[:num_cells]
    g_i = g_i[:num_cells]
    g_cnt = g_cnt[:num_cells]

    occupied = jnp.isfinite(g_z)
    max_height = jnp.float32(abs(b.max_z - b.min_z))
    height = jnp.where(occupied, g_z / max_height, 0.0)
    intensity = jnp.where(occupied, g_i, 0.0)
    density = jnp.where(
        occupied,
        jnp.minimum(1.0, jnp.log(g_cnt + 1.0) / jnp.log(jnp.float32(64.0))),
        0.0,
    )

    out = jnp.stack([intensity, height, density], axis=-1)
    out = out.reshape(H1, W1, 3)[: cfg.height, : cfg.width]
    return out.astype(jnp.float32)
