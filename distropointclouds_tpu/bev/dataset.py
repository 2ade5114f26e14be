"""BEV training data pipeline: filtering, mosaic, multiscale batching.

Covers the remaining `KittiDataset` capabilities
(`kitti_dataset.py:255-647`) that feed the legacy Complex-YOLO path:

- ``filter_valid_samples``: drop frames with no in-range training-class
  object (remove_invalid_idx, kitti_dataset.py:416-464).
- ``load_bev_sample``: lidar -> BEV map + YOLO targets (the
  load_img_with_targets core, kitti_dataset.py:322-359) using the
  TPU rasterizer.
- ``mosaic4``: 4-sample 2x2 mosaic composition with target remapping
  (load_mosaic, kitti_dataset.py:361-411). Host-side numpy: the canvas
  geometry is data-dependent, and this runs in the input pipeline.
- ``multiscale_size`` / ``resize_batch``: the every-10th-batch random
  rescale of the reference's collate_fn (kitti_dataset.py:609-626),
  sizes img_size +- 3 * 32.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import PointBatch
from ..geometry import boxes as B
from ..io.kitti import CalibrationData, KittiPaths, labels_to_array, read_label
from .config import BevConfig, Boundary
from .features import make_bev_feature
from .targets import build_yolo_target


def lidar_labels_for_sample(
    paths: KittiPaths, sample_id: int
) -> Tuple[np.ndarray, CalibrationData]:
    """(N, 8) float32 LiDAR-frame label array like the reference's
    (f32 array + in-place camera_to_lidar_box assignment)."""
    objects = read_label(paths.label(sample_id))
    calib = CalibrationData.read(paths.calib(sample_id))
    arr = labels_to_array(objects)
    lab32 = np.zeros((len(arr), 8), np.float32)
    if len(arr):
        lab32[:, 0] = arr[:, 0]
        lab32[:, 1:] = np.asarray(
            B.camera_to_lidar_box(
                jnp.asarray(arr[:, 1:].astype(np.float32)),
                jnp.asarray(calib.V2C),
                jnp.asarray(calib.R0),
            ),
            dtype=np.float32,
        )
    return lab32, calib


def filter_valid_samples(
    paths: KittiPaths,
    ids: Sequence[int],
    boundary: Boundary = Boundary(),
    verbose: bool = False,
) -> List[int]:
    """Keep samples having >= 1 known-class object inside the boundary
    (remove_invalid_idx, kitti_dataset.py:416-464; range check
    kitti_dataset.py:595-607)."""
    kept = []
    for sid in ids:
        lab, _ = lidar_labels_for_sample(paths, int(sid))
        ok = False
        for row in lab:
            if int(row[0]) in (0, 1, 2):
                x, y, z = row[1], row[2], row[3]
                if (
                    boundary.min_x <= x <= boundary.max_x
                    and boundary.min_y <= y <= boundary.max_y
                    and boundary.min_z <= z <= boundary.max_z
                ):
                    ok = True
                    break
        if ok:
            kept.append(int(sid))
        elif verbose:
            print(f"filtered sample {sid:06d}")
    return kept


def load_bev_sample(
    paths: KittiPaths,
    sample_id: int,
    cfg: BevConfig = BevConfig(),
    target_capacity: int = 50,
) -> Dict[str, np.ndarray]:
    """One frame -> {'bev' (H, W, 3) f32, 'targets' (K, 7), 'valid' (K,)}."""
    scan = np.fromfile(paths.lidar(sample_id), dtype=np.float32).reshape(-1, 4)
    pb = PointBatch.from_numpy(scan, cfg.max_points)
    bev = np.asarray(make_bev_feature(pb, cfg))
    lab32, _ = lidar_labels_for_sample(paths, sample_id)
    t, v = build_yolo_target(
        jnp.asarray(lab32), cfg.boundary, capacity=target_capacity
    )
    return {"bev": bev, "targets": np.asarray(t), "valid": np.asarray(v)}


def mosaic4(
    samples: Sequence[Dict[str, np.ndarray]],
    img_size: int = 608,
    rng: Optional[np.random.Generator] = None,
    random_padding: bool = False,
    fill: float = 0.5,
) -> Dict[str, np.ndarray]:
    """Compose 4 samples into a (2*img_size, 2*img_size) mosaic with
    remapped normalized targets (load_mosaic, kitti_dataset.py:361-411).
    Targets keep their (K, 7) layout with a validity mask."""
    assert len(samples) == 4
    rng = rng or np.random.default_rng()
    border = img_size // 2
    if random_padding:
        yc = int(rng.uniform(-(-border), 2 * img_size + (-border)))
        xc = int(rng.uniform(-(-border), 2 * img_size + (-border)))
        yc = int(np.clip(yc, 0, 2 * img_size))
        xc = int(np.clip(xc, 0, 2 * img_size))
    else:
        yc, xc = img_size, img_size

    canvas = np.full((2 * img_size, 2 * img_size, 3), fill, np.float32)
    out_targets = []
    out_valid = []
    for i, s in enumerate(samples):
        img = s["bev"]
        h, w = img.shape[:2]
        if i == 0:  # top left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
        elif i == 1:  # top right
            x1a, y1a = xc, max(yc - h, 0)
            x2a, y2a = min(xc + w, 2 * img_size), yc
            x1b, y1b = 0, h - (y2a - y1a)
        elif i == 2:  # bottom left
            x1a, y1a = max(xc - w, 0), yc
            x2a, y2a = xc, min(2 * img_size, yc + h)
            x1b, y1b = w - (x2a - x1a), 0
        else:  # bottom right
            x1a, y1a = xc, yc
            x2a, y2a = min(xc + w, 2 * img_size), min(2 * img_size, yc + h)
            x1b, y1b = 0, 0
        x2b, y2b = x1b + (x2a - x1a), y1b + (y2a - y1a)
        canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        padw, padh = x1a - x1b, y1a - y1b

        t = s["targets"].copy()
        # columns: [cls, y, x, w, l, im, re] (normalized); the reference's
        # mosaic operates on (box_idx, cls, x=col2, y=col3, ...) — ours
        # stores y at col 1, x at col 2.
        t[:, 2] = (t[:, 2] * w + padw) / (2 * img_size)
        t[:, 1] = (t[:, 1] * h + padh) / (2 * img_size)
        t[:, 3] = t[:, 3] * w / (2 * img_size)
        t[:, 4] = t[:, 4] * h / (2 * img_size)
        out_targets.append(t)
        out_valid.append(s["valid"])

    targets = np.concatenate(out_targets)
    # clamp centers like the reference (kitti_dataset.py:409)
    hi = 1.0 - 0.5 / img_size
    targets[:, 1:3] = np.clip(targets[:, 1:3], 0.0, hi)
    return {
        "bev": canvas,
        "targets": targets,
        "valid": np.concatenate(out_valid),
    }


def multiscale_size(
    batch_index: int,
    rng: np.random.Generator,
    img_size: int = 608,
    every: int = 10,
) -> int:
    """The reference's collate_fn picks a new size from
    img_size - 3*32 .. img_size + 3*32 every 10th batch
    (kitti_dataset.py:615-623)."""
    if batch_index % every == 0:
        return int(rng.choice(np.arange(img_size - 3 * 32, img_size + 3 * 32 + 1, 32)))
    return img_size


def resize_batch(bev: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear batch resize to (size, size) (the torch interpolate of
    kitti_dataset.py:622), NHWC, jittable per target size."""
    B_, H, W, C = bev.shape
    return jax.image.resize(bev, (B_, size, size, C), method="bilinear")
