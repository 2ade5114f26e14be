"""YOLO-output -> KITTI-format conversion and image/BEV composition.

Equivalents of `distro_model/utils/visualization_utils.py:200-345`
(merge_rgb_to_bev, invert_target, predictions_to_kitti_format) and the
camera-frame box projection `kitti_data_utils.py:347-382`
(compute_box_3d). The per-object Python loops become vectorized jnp on
padded arrays; the final KITTI label strings are host-side.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..geometry import boxes as B
from ..geometry import calib as C
from ..io.kitti import CalibrationData, ObjectLabel
from .config import Boundary
from .targets import inverse_yolo_target

CLASS_NAMES = {0: "Car", 1: "Pedestrian", 2: "Cyclist"}


def compute_box_3d_camera(
    h: jnp.ndarray, w: jnp.ndarray, l: jnp.ndarray,
    t: jnp.ndarray, ry: jnp.ndarray,
) -> jnp.ndarray:
    """(..., 8, 3) rect-camera corners of KITTI boxes (y-down, box bottom
    at t_y; kitti_data_utils.py:347-372 corner ordering)."""
    xs = jnp.stack([l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2],
                   axis=-1)
    ys = jnp.stack(
        [jnp.zeros_like(h)] * 4 + [-h] * 4, axis=-1
    )
    zs = jnp.stack([w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2],
                   axis=-1)
    c, s = jnp.cos(ry)[..., None], jnp.sin(ry)[..., None]
    # roty: x' = c x + s z ; z' = -s x + c z (kitti_data_utils.py:273-279)
    gx = c * xs + s * zs + t[..., 0:1]
    gy = ys + t[..., 1:2]
    gz = -s * xs + c * zs + t[..., 2:3]
    return jnp.stack([gx, gy, gz], axis=-1)


def yolo_to_kitti_objects(
    targets: np.ndarray,
    calib: CalibrationData,
    img_shape_2d: Tuple[int, int],
    boundary: Boundary = Boundary(),
) -> List[ObjectLabel]:
    """(K, 7) YOLO targets -> KITTI ObjectLabels with camera-frame pose,
    observation angle alpha, and clipped 2D image boxes — the shared core
    of invert_target / predictions_to_kitti_format
    (visualization_utils.py:220-278, 281-345)."""
    targets = np.asarray(targets).reshape(-1, 7)
    if not len(targets):
        return []
    labels = np.asarray(inverse_yolo_target(jnp.asarray(targets), boundary))
    cam = np.asarray(
        B.lidar_to_camera_box(
            jnp.asarray(labels[:, 1:]),
            jnp.asarray(calib.V2C),
            jnp.asarray(calib.R0),
        )
    )
    cls = labels[:, 0].astype(int)
    # Wrap ry into (-pi, pi] via atan2(sin, cos)
    # (visualization_utils.py:242).
    ry = np.arctan2(np.sin(cam[:, 6]), np.cos(cam[:, 6]))
    corners = np.asarray(
        compute_box_3d_camera(
            jnp.asarray(cam[:, 3]),
            jnp.asarray(cam[:, 4]),
            jnp.asarray(cam[:, 5]),
            jnp.asarray(cam[:, :3]),
            jnp.asarray(ry),
        )
    )
    img_boxes, _ = C.corners3d_to_img_boxes(
        jnp.asarray(corners), jnp.asarray(calib.P2)
    )
    img_boxes = np.array(img_boxes)  # writable host copy
    H, W = img_shape_2d
    img_boxes[:, 0] = np.clip(img_boxes[:, 0], 0, W - 1)
    img_boxes[:, 1] = np.clip(img_boxes[:, 1], 0, H - 1)
    img_boxes[:, 2] = np.clip(img_boxes[:, 2], 0, W - 1)
    img_boxes[:, 3] = np.clip(img_boxes[:, 3], 0, H - 1)

    out = []
    for i in range(len(labels)):
        x, z = cam[i, 0], cam[i, 2]
        beta = np.arctan2(z, x)
        alpha = -np.sign(beta) * np.pi / 2 + beta + ry[i]
        name = CLASS_NAMES.get(int(cls[i]), "Ignore")
        obj = ObjectLabel(
            type=name,
            cls_id=int(cls[i]) if name != "Ignore" else -1,
            truncation=-1.0,
            occlusion=-1,
            alpha=float(alpha),
            box2d=img_boxes[i],
            h=float(cam[i, 3]),
            w=float(cam[i, 4]),
            l=float(cam[i, 5]),
            t=(float(cam[i, 0]), float(cam[i, 1]), float(cam[i, 2])),
            ry=float(ry[i]),
            score=-1.0,
            level=4,
            level_str="UnKnown",
        )
        out.append(obj)
    return out


def detections_to_kitti_format(
    img_detections: Sequence[Optional[np.ndarray]],
    calib: CalibrationData,
    img_shape_2d: Tuple[int, int],
    img_size: int,
    boundary: Boundary = Boundary(),
) -> List[ObjectLabel]:
    """Network-output rows ``[x, y, w, l, im, re, ..., cls]`` in BEV
    pixels -> KITTI objects (predictions_to_kitti_format,
    visualization_utils.py:281-345)."""
    rows = []
    for det in img_detections:
        if det is None:
            continue
        for row in np.asarray(det):
            x, y, w, l, im, re = row[:6]
            cls_pred = row[-1]
            rows.append(
                [cls_pred, x / img_size, y / img_size, w / img_size,
                 l / img_size, im, re]
            )
    if not rows:
        return []
    return yolo_to_kitti_objects(
        np.asarray(rows), calib, img_shape_2d, boundary
    )


def merge_rgb_to_bev(
    img_rgb: np.ndarray, img_bev: np.ndarray, output_width: int
) -> np.ndarray:
    """Stack camera image over BEV at a common width
    (visualization_utils.py:200-217)."""
    import cv2

    rh, rw = img_rgb.shape[:2]
    out_rh = int(output_width / rw * rh)
    top = cv2.resize(img_rgb, (output_width, out_rh))
    bh, bw = img_bev.shape[:2]
    out_bh = int(output_width / bw * bh)
    bottom = cv2.resize(img_bev, (output_width, out_bh))
    out = np.zeros((out_rh + out_bh, output_width, 3), np.uint8)
    out[:out_rh] = top
    out[out_rh:] = bottom
    return out
