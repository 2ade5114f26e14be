"""Pedestrian label records in scan-context space (the "label factory").

Produces the per-pedestrian dicts the reference writes to
``pedestrians_*.json`` (`kitti_dataset.py:161-201,530-567`):

  {class, x, y, z, h, w, l, yaw, center_ring_idx, center_sector_idx,
   covered_cells, distance, angle}

Two sources, merged exactly like `generate_scan_context`
(kitti_dataset.py:477-488):
  (a) an (N, 8) LiDAR-frame label array [cls, x, y, z, h, w, l, yaw]
      (itself produced by ``camera_to_lidar_box``), and
  (b) raw parsed objects + calibration, converting the KITTI
      bottom-center to mid-height (``t[1] - h/2``, kitti_dataset.py:539)
      and deriving LiDAR yaw via the forward-step projection.

Source (b) is slightly different from (a) (~1 cm offsets), so every
pedestrian appears TWICE in the merged output — a reference quirk
(SURVEY §2.3) preserved by default and removable with ``dedupe=True``.

Unlike the reference (which generates labels as a ``__getitem__`` side
effect with concurrent-worker file races, kitti_dataset.py:466-527),
this is an explicit, pure, deterministic batch step; file writing lives
in the CLI.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core.config import ScanContextConfig
from ..geometry import boxes as _boxes
from ..io.kitti import PEDESTRIAN_ID, CalibrationData, ObjectLabel
from .covered_cells import covered_cells_list


def pad_rows_bucket(n: int, bucket: int = 16) -> int:
    """Next multiple of ``bucket`` >= n (>= bucket). Shape-bucketing for
    eager per-scan geometry calls: row-independent ops padded to a
    bucket compile once per bucket instead of once per distinct row
    count (the label factory's dominant cost was exactly those
    recompiles on a corpus with varying object counts)."""
    return max(bucket, ((n + bucket - 1) // bucket) * bucket)


def _record(
    x: float,
    y: float,
    z: float,
    h: float,
    w: float,
    l: float,
    yaw: float,
    cfg: ScanContextConfig,
    f32_polar: bool = False,
) -> Dict:
    if f32_polar:
        # Source (a) feeds float32 label-array scalars (the reference's
        # labels array is float32, kitti_bev_utils.py:92, and
        # kitti_dataset.py:196-197 computes hypot/arctan2 on them), so
        # distance/angle carry float32 precision, while the trailing
        # `% 360.0` ran in float64 under numpy-1.x value-based casting.
        # Residual caveat: float32 arctan2/degrees are libm-dependent, so
        # the stored fixture angles can differ from any modern
        # recomputation by <= 1 float32 ulp (~4e-6 deg); the parity tests
        # assert exactness on every field except that ulp on `angle`.
        xf, yf = np.float32(x), np.float32(y)
        theta = float(np.degrees(np.arctan2(yf, xf))) % 360.0
        r = float(np.hypot(xf, yf))
    else:
        # Source (b) uses Python floats -> all float64
        # (kitti_dataset.py:563-564).
        theta = float(np.degrees(np.arctan2(y, x)) % 360.0)
        r = float(np.hypot(x, y))
    ring = int(min(r / cfg.gap_ring, cfg.num_ring - 1))
    sector = int(theta / cfg.gap_sector)
    covered = covered_cells_list(x, y, l, w, yaw, cfg)
    return {
        "class": PEDESTRIAN_ID,
        "x": float(x),
        "y": float(y),
        "z": float(z),
        "h": float(h),
        "w": float(w),
        "l": float(l),
        "yaw": float(yaw),
        "center_ring_idx": ring,
        "center_sector_idx": min(sector, cfg.num_sector - 1),
        "covered_cells": covered.tolist(),
        "distance": r,
        "angle": theta,
    }


def pedestrians_from_label_array(
    labels: np.ndarray, cfg: ScanContextConfig = ScanContextConfig()
) -> List[Dict]:
    """Source (a): (N, 8) LiDAR label array -> records
    (kitti_dataset.py:161-201, find_pedestrians_in_scan_context)."""
    out = []
    for lab in np.asarray(labels).reshape(-1, 8):
        cls_id, x, y, z, h, w, l, yaw = (float(v) for v in lab)
        if int(cls_id) != PEDESTRIAN_ID:
            continue
        out.append(_record(x, y, z, h, w, l, yaw, cfg, f32_polar=True))
    return out


def pedestrians_from_objects(
    objects: Sequence[ObjectLabel],
    calib: CalibrationData,
    cfg: ScanContextConfig = ScanContextConfig(),
) -> List[Dict]:
    """Source (b): parsed objects + calib -> records
    (kitti_dataset.py:530-567, objects_to_pedestrians_in_scan_context)."""
    import jax.numpy as jnp

    peds = [
        obj for obj in objects
        if obj.type in ("Pedestrian", "Person_sitting")
    ]
    if not peds:
        return []
    # One batched projection for all pedestrians: the per-object eager
    # jnp calls dominated the label factory (~7 ms/ped of dispatch on
    # the 1-core host); both geometry functions vectorize over leading
    # dims and the f32 math is elementwise/3-term dots, so batching is
    # value-identical (gated by the exact-JSON parity tests).
    V2C = jnp.asarray(calib.V2C)
    R0 = jnp.asarray(calib.R0)
    centers_rect = np.array(
        [[o.t[0], o.t[1] - o.h / 2.0, o.t[2]] for o in peds], np.float32
    )
    rys = np.array([o.ry for o in peds], np.float32)
    # Pad the row count to a bucket so eager XLA compiles one program
    # per bucket instead of one per distinct pedestrian count (the ops
    # are row-independent, so pad rows cannot change real rows).
    n = len(peds)
    nb = pad_rows_bucket(n)
    centers_pad = np.zeros((nb, 3), np.float32)
    centers_pad[:n] = centers_rect
    rys_pad = np.zeros((nb,), np.float32)
    rys_pad[:n] = rys
    velos = np.asarray(
        _boxes.camera_to_lidar_points(jnp.asarray(centers_pad), V2C, R0)
    )[:n]
    yaws = np.asarray(
        _boxes.rect_yaw_to_velo_yaw(
            jnp.asarray(rys_pad), jnp.asarray(centers_pad), V2C, R0
        )
    )[:n]
    return [
        _record(
            float(velo[0]),
            float(velo[1]),
            float(velo[2]),
            obj.h,
            obj.w,
            obj.l,
            float(yaw),
            cfg,
        )
        for obj, velo, yaw in zip(peds, velos, yaws)
    ]


def merged_pedestrians(
    labels: Optional[np.ndarray],
    objects: Optional[Sequence[ObjectLabel]],
    calib: Optional[CalibrationData],
    cfg: ScanContextConfig = ScanContextConfig(),
    dedupe: bool = False,
) -> List[Dict]:
    """Both sources concatenated, as `generate_scan_context` does
    (kitti_dataset.py:477-488). ``dedupe=True`` consciously drops the
    duplicate-entry quirk by greedy matching within 0.2 m."""
    records: List[Dict] = []
    if labels is not None:
        records.extend(pedestrians_from_label_array(labels, cfg))
    if objects is not None and calib is not None:
        records.extend(pedestrians_from_objects(objects, calib, cfg))
    if not dedupe:
        return records
    kept: List[Dict] = []
    for rec in records:
        if any(
            np.hypot(rec["x"] - k["x"], rec["y"] - k["y"]) < 0.2 for k in kept
        ):
            continue
        kept.append(rec)
    return kept


def pedestrians_to_padded_arrays(
    peds: Sequence[Dict], capacity: int
) -> Dict[str, np.ndarray]:
    """Pack records into fixed-size arrays for jitted target building.

    Returns dict with 'centers' (P, 2) f32, 'boxes' (P, 5) f32
    [x, y, l, w, yaw], 'distance' (P,) f32, 'valid' (P,) bool. Invalid
    rows use l = w = -1 so they cover no cells.
    """
    P = capacity
    centers = np.zeros((P, 2), np.float32)
    boxes = np.full((P, 5), -1.0, np.float32)
    boxes[:, :2] = 0.0
    boxes[:, 4] = 0.0
    distance = np.zeros((P,), np.float32)
    valid = np.zeros((P,), bool)
    for i, ped in enumerate(peds[:P]):
        centers[i] = (ped["center_ring_idx"], ped["center_sector_idx"])
        boxes[i] = (ped["x"], ped["y"], ped["l"], ped["w"], ped["yaw"])
        distance[i] = ped.get("distance", float(np.hypot(ped["x"], ped["y"])))
        valid[i] = True
    return {
        "centers": centers,
        "boxes": boxes,
        "distance": distance,
        "valid": valid,
    }
