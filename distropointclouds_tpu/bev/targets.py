"""YOLO-format BEV target encode/decode (`kitti_bev_utils.py:99-159`).

Targets are rows ``[class, y, x, w, l, sin(yaw'), cos(yaw')]`` with
coordinates normalized to the boundary box, sizes padded by +0.3 m, and
``yaw' = 2*pi - yaw`` (build_yolo_target, kitti_bev_utils.py:122-138).
TPU version is vectorized with a fixed capacity + validity mask instead
of ragged lists.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .config import Boundary


def build_yolo_target(
    labels: jnp.ndarray,
    boundary: Boundary = Boundary(),
    capacity: int = 50,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, 8) [cls, x, y, z, h, w, l, yaw] LiDAR labels ->
    ((capacity, 7) targets, (capacity,) valid).

    In-range filter is strict inequality on x and y like the reference
    (kitti_bev_utils.py:131). Out-of-range rows are packed out by a
    stable sort on validity (scatter-free compaction).
    """
    labels = jnp.asarray(labels).reshape(-1, 8)
    cl = labels[:, 0]
    x, y = labels[:, 1], labels[:, 2]
    w = labels[:, 5] + 0.3
    l = labels[:, 6] + 0.3
    yaw = 2.0 * jnp.pi - labels[:, 7]
    ok = (
        (x > boundary.min_x)
        & (x < boundary.max_x)
        & (y > boundary.min_y)
        & (y < boundary.max_y)
    )
    y1 = (y - boundary.min_y) / (boundary.max_y - boundary.min_y)
    x1 = (x - boundary.min_x) / (boundary.max_x - boundary.min_x)
    w1 = w / (boundary.max_y - boundary.min_y)
    l1 = l / (boundary.max_x - boundary.min_x)
    rows = jnp.stack(
        [cl, y1, x1, w1, l1, jnp.sin(yaw), jnp.cos(yaw)], axis=-1
    ).astype(jnp.float32)
    rows = jnp.where(ok[:, None], rows, 0.0)

    # Stable partition: valid rows first, original order preserved.
    order = jnp.argsort(jnp.logical_not(ok), stable=True)
    rows = rows[order]
    ok_sorted = ok[order]
    n = rows.shape[0]
    if n >= capacity:
        return rows[:capacity], ok_sorted[:capacity]
    pad = capacity - n
    return (
        jnp.concatenate([rows, jnp.zeros((pad, 7), jnp.float32)]),
        jnp.concatenate([ok_sorted, jnp.zeros((pad,), bool)]),
    )


def inverse_yolo_target(
    targets: jnp.ndarray, boundary: Boundary = Boundary()
) -> jnp.ndarray:
    """(K, 7) targets -> (K, 8) labels (inverse_yolo_target,
    kitti_bev_utils.py:141-159), including the class-dependent fixed
    heights (Car 1.5 / Pedestrian 1.8 / Cyclist 1.4, z = -1.55) and the
    ``-arctan2(im, re) - 2*pi`` yaw decode."""
    t = jnp.asarray(targets).reshape(-1, 7)
    c = t[:, 0]
    y = t[:, 1] * (boundary.max_y - boundary.min_y) + boundary.min_y
    x = t[:, 2] * (boundary.max_x - boundary.min_x) + boundary.min_x
    w = t[:, 3] * (boundary.max_y - boundary.min_y) - 0.3
    l = t[:, 4] * (boundary.max_x - boundary.min_x) - 0.3
    z = jnp.full_like(c, -1.55)
    h = jnp.where(c == 1, 1.8, jnp.where(c == 2, 1.4, 1.5))
    yaw = -jnp.arctan2(t[:, 5], t[:, 6]) - 2.0 * jnp.pi
    return jnp.stack([c, x, y, z, h, w, l, yaw], axis=-1)


def get_corners(
    x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray, l: jnp.ndarray, yaw: jnp.ndarray
) -> jnp.ndarray:
    """(..., 4, 2) rotated-rectangle corners in BEV image coordinates
    (kitti_bev_utils.py:99-119; order: front-left, rear-left,
    rear-right, front-right), vectorized over leading dims."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    hw, hl = w / 2.0, l / 2.0
    fl = jnp.stack([x - hw * c - hl * s, y - hw * s + hl * c], axis=-1)
    rl = jnp.stack([x - hw * c + hl * s, y - hw * s - hl * c], axis=-1)
    rr = jnp.stack([x + hw * c + hl * s, y + hw * s - hl * c], axis=-1)
    fr = jnp.stack([x + hw * c - hl * s, y + hw * s + hl * c], axis=-1)
    return jnp.stack([fl, rl, rr, fr], axis=-2)
