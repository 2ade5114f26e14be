"""KITTI raw-format decoding (host side).

Covers the reference's L0 IO layer:
- ``.bin`` Velodyne scan decode — `scaner_version2.py:57-62`,
  `distro_model/data_process/kitti_data_utils.py:318-321`.
- KITTI object-label parsing (15/16-field lines) —
  `kitti_data_utils.py:13-89` (``Object3d``).
- Calibration file parsing — `kitti_data_utils.py:125-162`.

Decoding is plain numpy on the host (it is a single ``np.fromfile``);
everything downstream of this module is fixed-shape JAX. Labels are
returned as numpy structured-ish plain arrays rather than per-object
Python classes so they can be fed to vectorized JAX label kernels.
"""

from __future__ import annotations

import dataclasses
import os
from glob import glob
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.types import PointBatch

# Class mapping of kitti_data_utils.py:44-56 (Car/Van -> 0,
# Pedestrian/Person_sitting -> 1, Cyclist -> 2, everything else -> -1).
CLASS_NAME_TO_ID: Dict[str, int] = {
    "Car": 0,
    "Pedestrian": 1,
    "Cyclist": 2,
    "Van": 0,
    "Person_sitting": 1,
}

PEDESTRIAN_ID = 1


def load_velo_scan(path: str) -> np.ndarray:
    """Decode a KITTI Velodyne ``.bin`` into an (N, 4) float32 array."""
    scan = np.fromfile(path, dtype=np.float32)
    return scan.reshape((-1, 4))


def load_point_batch(path: str, max_points: int = 131072) -> PointBatch:
    """Decode a scan into a fixed-size padded PointBatch."""
    return PointBatch.from_numpy(load_velo_scan(path), max_points=max_points)


@dataclasses.dataclass
class ObjectLabel:
    """One parsed KITTI label line (kitti_data_utils.py:13-89)."""

    type: str
    cls_id: int
    truncation: float
    occlusion: int
    alpha: float
    box2d: np.ndarray  # [xmin, ymin, xmax, ymax]
    h: float
    w: float
    l: float
    t: Tuple[float, float, float]  # location in camera (rect) coords
    ry: float
    score: float
    level: int
    level_str: str

    @staticmethod
    def parse(line: str) -> "ObjectLabel":
        parts = line.split(" ")
        vals = [float(x) for x in parts[1:]]
        typ = parts[0]
        box2d = np.array(vals[3:7], dtype=np.float64)
        truncation, occlusion = vals[0], int(vals[1])
        # Difficulty rubric of kitti_data_utils.py:58-72.
        height = float(box2d[3]) - float(box2d[1]) + 1
        if height >= 40 and truncation <= 0.15 and occlusion <= 0:
            level, level_str = 1, "Easy"
        elif height >= 25 and truncation <= 0.3 and occlusion <= 1:
            level, level_str = 2, "Moderate"
        elif height >= 25 and truncation <= 0.5 and occlusion <= 2:
            level, level_str = 3, "Hard"
        else:
            level, level_str = 4, "UnKnown"
        return ObjectLabel(
            type=typ,
            cls_id=CLASS_NAME_TO_ID.get(typ, -1),
            truncation=truncation,
            occlusion=occlusion,
            alpha=vals[2],
            box2d=box2d,
            h=vals[7],
            w=vals[8],
            l=vals[9],
            t=(vals[10], vals[11], vals[12]),
            ry=vals[13],
            score=vals[14] if len(vals) == 15 else -1.0,
            level=level,
            level_str=level_str,
        )

    def to_kitti_format(self) -> str:
        return (
            "%s %.2f %d %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f "
            "%.2f %.2f %.2f"
            % (
                self.type,
                self.truncation,
                int(self.occlusion),
                self.alpha,
                self.box2d[0],
                self.box2d[1],
                self.box2d[2],
                self.box2d[3],
                self.h,
                self.w,
                self.l,
                self.t[0],
                self.t[1],
                self.t[2],
                self.ry,
                self.score,
            )
        )


def read_label(path: str) -> List[ObjectLabel]:
    with open(path) as f:
        return [ObjectLabel.parse(line.rstrip()) for line in f if line.strip()]


def labels_to_array(
    objects: Sequence[ObjectLabel], include_dontcare: bool = False
) -> np.ndarray:
    """Pack labels into an (N, 8) float array
    ``[cls_id, x_cam, y_cam, z_cam, h, w, l, ry]``, the camera-frame label
    array of `kitti_bev_utils.py:79-95` (read_labels_for_bevbox).
    """
    rows = []
    for obj in objects:
        if obj.cls_id == -1 and not include_dontcare:
            continue
        rows.append(
            [obj.cls_id, obj.t[0], obj.t[1], obj.t[2], obj.h, obj.w, obj.l, obj.ry]
        )
    if not rows:
        return np.zeros((0, 8), dtype=np.float64)
    return np.array(rows, dtype=np.float64)


@dataclasses.dataclass
class CalibrationData:
    """Parsed KITTI calibration matrices (kitti_data_utils.py:125-162).

    Pure data; the projection math lives in
    :mod:`distropointclouds_tpu.geometry.calib` as jittable functions.
    """

    P2: np.ndarray  # (3, 4) rect-camera -> image2 projection
    P3: np.ndarray  # (3, 4)
    R0: np.ndarray  # (3, 3) ref -> rect rotation
    V2C: np.ndarray  # (3, 4) velodyne -> ref camera rigid transform

    @property
    def C2V(self) -> np.ndarray:
        return inverse_rigid_trans(self.V2C)

    @staticmethod
    def read(path: str) -> "CalibrationData":
        with open(path) as f:
            lines = f.readlines()
        # Fixed line positions, matching kitti_data_utils.py:146-162.
        P2 = np.array(lines[2].strip().split(" ")[1:], dtype=np.float32)
        P3 = np.array(lines[3].strip().split(" ")[1:], dtype=np.float32)
        R0 = np.array(lines[4].strip().split(" ")[1:], dtype=np.float32)
        V2C = np.array(lines[5].strip().split(" ")[1:], dtype=np.float32)
        return CalibrationData(
            P2=P2.reshape(3, 4),
            P3=P3.reshape(3, 4),
            R0=R0.reshape(3, 3),
            V2C=V2C.reshape(3, 4),
        )


def inverse_rigid_trans(Tr: np.ndarray) -> np.ndarray:
    """Invert a (3, 4) rigid [R|t] transform (kitti_data_utils.py:298-305)."""
    inv = np.zeros_like(Tr)
    inv[0:3, 0:3] = Tr[0:3, 0:3].T
    inv[0:3, 3] = -Tr[0:3, 0:3].T @ Tr[0:3, 3]
    return inv


def discover_scan_ids(directory: str) -> List[int]:
    """List sample ids from ``sc_*.npy`` files (tiny_sc_ped.py:43-52)."""
    paths = sorted(glob(os.path.join(directory, "sc_*.npy")))
    return [int(os.path.basename(p).split("_")[1].split(".")[0]) for p in paths]


def discover_bins(directory: str) -> List[str]:
    """Sorted list of ``.bin`` paths (scaner_version2.py:11-19)."""
    return sorted(glob(os.path.join(directory, "*.bin")))


@dataclasses.dataclass
class KittiPaths:
    """Standard KITTI object-detection directory layout
    (kitti_dataset.py:275-285)."""

    root: str
    split: str = "training"  # training | testing

    @property
    def lidar_dir(self) -> str:
        return os.path.join(self.root, self.split, "velodyne")

    @property
    def label_dir(self) -> str:
        return os.path.join(self.root, self.split, "label_2")

    @property
    def calib_dir(self) -> str:
        return os.path.join(self.root, self.split, "calib")

    @property
    def image_dir(self) -> str:
        return os.path.join(self.root, self.split, "image_2")

    @property
    def scan_context_dir(self) -> str:
        return os.path.join(self.root, self.split, "scan_context")

    def imageset_file(self, mode: str) -> str:
        return os.path.join(self.root, "ImageSets", f"{mode}.txt")

    def sample_ids(self, mode: str) -> List[int]:
        with open(self.imageset_file(mode)) as f:
            return [int(x.strip()) for x in f if x.strip()]

    def lidar(self, idx: int) -> str:
        return os.path.join(self.lidar_dir, f"{idx:06d}.bin")

    def label(self, idx: int) -> str:
        return os.path.join(self.label_dir, f"{idx:06d}.txt")

    def calib(self, idx: int) -> str:
        return os.path.join(self.calib_dir, f"{idx:06d}.txt")

    def image(self, idx: int) -> str:
        return os.path.join(self.image_dir, f"{idx:06d}.png")
